"""Smoke tests for the analysis/figure scripts (reference scripts/ parity)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run(script, *args):
    # generous timeout: scripts that import jax pay ~30-60 s of cold import
    # on a loaded CPU host
    return subprocess.run([sys.executable, os.path.join(SCRIPTS, script), *args],
                          capture_output=True, text=True, env=ENV, timeout=480)


class TestPruneDataset:
    def test_prunes_and_renormalizes(self, tmp_path):
        frames = [{"file_path": f"./train/r_0_{t}", "time": t / 4.0,
                   "transform_matrix": np.eye(4).tolist()} for t in range(5)]
        data = {"camera_angle_x": 0.7, "frames": frames}
        for split in ("transforms_train.json", "transforms_test.json"):
            with open(tmp_path / split, "w") as f:
                json.dump(data, f)
        r = run("prune_dataset.py", "--dataset", str(tmp_path), "--n_frames", "3")
        assert r.returncode == 0, r.stderr
        with open(tmp_path / "transforms_train.json") as f:
            pruned = json.load(f)
        times = sorted({fr["time"] for fr in pruned["frames"]})
        assert times == [0.0, 0.5, 1.0]
        assert len(pruned["frames"]) == 3
        assert os.path.exists(tmp_path / "transforms_train_all.json")


class TestCalModelsize:
    def test_sums_artifacts(self, tmp_path):
        d = tmp_path / "scene_a" / "point_cloud" / "iteration_100"
        os.makedirs(d)
        (d / "point_cloud.ply").write_bytes(b"x" * 2048)
        r = run("cal_modelsize.py", "--output", str(tmp_path))
        assert r.returncode == 0, r.stderr
        assert "scene_a" in r.stdout
        assert "average size (MB)" in r.stdout


class TestFigure4:
    def test_writes_overlays(self, tmp_path):
        T, M = 4, 10
        trajs = np.cumsum(np.random.default_rng(0).normal(
            0, 0.01, size=(T, M, 3)), axis=0).astype(np.float32)
        trajs[..., 2] += 3.0
        np.savez(tmp_path / "all_trajs.npz", traj=trajs)
        # simple perspective projection matrix (row-vector convention)
        proj = np.zeros((4, 4))
        proj[0, 0] = proj[1, 1] = 1.0
        proj[2, 3] = 1.0
        proj[2, 2] = 1.0
        with open(tmp_path / "pose.json", "w") as f:
            json.dump({"full_proj": proj.tolist(), "width": 64, "height": 64}, f)
        os.makedirs(tmp_path / "images")
        import imageio.v2 as imageio
        for t in range(T):
            imageio.imwrite(tmp_path / "images" / f"{t:04d}.png",
                            np.zeros((64, 64, 3), np.uint8))
        r = run("figure_4.py", "--folder", str(tmp_path), "--n_tracks", "5")
        assert r.returncode == 0, r.stderr
        outs = os.listdir(tmp_path / "figure_4")
        assert len(outs) == T


class TestVizDatasets:
    def test_frame_order_interleaves(self):
        sys.path.insert(0, SCRIPTS)
        try:
            from viz_datasets import frame_order
        finally:
            sys.path.remove(SCRIPTS)
        frames = [{"time": t / 2.0} for t in range(3)] * 4   # 3 times x 4 views
        order = frame_order(frames)
        assert len(order) == 12
        assert sorted(set(order)) != [0]   # visits many frames
        # stride is n_times + 1 = 4
        assert order[1] - order[0] == 4


class TestPopulateFinalResults:
    def test_aligns_and_copies(self, tmp_path):
        T, M = 3, 6
        gt = np.random.default_rng(0).normal(size=(T, M, 3)).astype(np.float32)
        out_scene = tmp_path / "output" / "scene_x" / "test" / "ours_8000"
        os.makedirs(out_scene)
        np.savez(out_scene / "all_trajs.npz", traj=gt,
                 rotations=np.tile([1.0, 0, 0, 0], (T, M, 1)).astype(np.float32))
        res_scene = tmp_path / "results" / "scene_x"
        os.makedirs(res_scene)
        np.savez(res_scene / "gt.npz", traj=gt)
        r = run("populate_final_results.py",
                "--results", str(tmp_path / "results"),
                "--output", str(tmp_path / "output"))
        assert r.returncode == 0, r.stderr
        assert os.path.exists(res_scene / "ours" / "traj.npz")


class TestGenVizTraj:
    def test_pingpong_times_and_densify(self, tmp_path):
        frames = []
        for v in range(6):
            m = np.eye(4); m[0, 3] = v * 0.1
            frames.append({"file_path": f"./test/r_{v}_0", "time": 0.0,
                           "transform_matrix": m.tolist()})
        data = {"camera_angle_x": 0.7, "frames": frames}
        with open(tmp_path / "transforms_test.json", "w") as f:
            json.dump(data, f)
        r = run("gen_viz_traj.py", "--folder", str(tmp_path), "--densify")
        assert r.returncode == 0, r.stderr
        with open(tmp_path / "video.json") as f:
            traj = json.load(f)
        times = [fr["time"] for fr in traj["frames"]]
        assert len(times) == 11            # 6 poses densified
        assert max(times) == 1.0 and min(times) == 0.0
        # forward then backward sweep
        assert times[0] == 0.0 and 1.0 in times


class TestSelectImage:
    def test_stride_and_pingpong(self, tmp_path):
        import imageio.v2 as imageio
        src = tmp_path / "renders"
        os.makedirs(src)
        for i in range(10):
            imageio.imwrite(src / f"{i:05d}.png",
                            np.full((4, 4, 3), i * 20, np.uint8))
        out = tmp_path / "sel"
        r = run("select_image.py", "--dirs", str(src), "--stride", "3",
                "--pingpong", "--out", str(out))
        assert r.returncode == 0, r.stderr
        files = sorted(os.listdir(out))
        assert len(files) == 4 + 3          # [0,3,6,9] + [6,3,0]
