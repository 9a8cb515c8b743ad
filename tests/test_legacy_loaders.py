"""Legacy loader tests: COLMAP / D-NeRF / DyNeRF / HyperNeRF
(reference dataset_readers.py:151-200,402-448,526-583,469-499)."""

import json
import os
import struct

import numpy as np
import pytest

from cloth_splatting_tpu.data.legacy import (
    load_colmap_scene,
    load_dnerf_scene,
    load_dynerf_scene,
    load_hypernerf_scene,
    qvec2rotmat,
    read_colmap_cameras_binary,
    read_colmap_images_binary,
    read_colmap_points3d_binary,
    scene_load_callbacks,
)


# ------------------------------------------------------------------ fixtures


def _write_colmap_binary(root, n_cams=3):
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse)
    os.makedirs(os.path.join(root, "images"))
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))           # PINHOLE
        f.write(struct.pack("<4d", 50.0, 50.0, 32.0, 24.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))   # identity quat
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png\x00".encode())
            f.write(struct.pack("<Q", 2))                     # 2 track points
            f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for pid in range(2):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", pid, 0.5, -0.5))
            f.write(struct.pack("<3B", 255, 128, 0))
            f.write(struct.pack("<d", 0.1))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return root


class TestColmap:
    def test_binary_parsers(self, tmp_path):
        root = _write_colmap_binary(str(tmp_path))
        sparse = os.path.join(root, "sparse", "0")
        cams = read_colmap_cameras_binary(os.path.join(sparse, "cameras.bin"))
        assert cams[1]["model"] == "PINHOLE"
        assert cams[1]["width"] == 64
        np.testing.assert_allclose(cams[1]["params"], [50, 50, 32, 24])
        imgs = read_colmap_images_binary(os.path.join(sparse, "images.bin"))
        assert len(imgs) == 3
        assert imgs[1]["name"] == "img_000.png"
        xyz, rgb = read_colmap_points3d_binary(os.path.join(sparse, "points3D.bin"))
        assert xyz.shape == (2, 3)
        np.testing.assert_allclose(rgb[0], [1.0, 128 / 255, 0.0])

    def test_scene_split_and_radius(self, tmp_path):
        root = _write_colmap_binary(str(tmp_path), n_cams=5)
        scene = load_colmap_scene(root, eval_split=True, llffhold=2)
        assert len(scene.train) + len(scene.test) == 5
        assert len(scene.test) == 3          # indices 0, 2, 4
        assert scene.point_cloud is not None
        assert scene.radius > 0
        assert scene.maxtime == 0.0
        # transposed-R quirk: identity quat -> identity R
        np.testing.assert_allclose(
            scene.train[0].camera.camera_center,
            -np.array([0.1, 0.0, 2.0]), atol=1e-6)

    def test_qvec_roundtrip(self):
        q = np.array([0.9238795, 0.0, 0.3826834, 0.0])  # 45 deg about y
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


class TestDnerf:
    def test_loads_synthetic_transforms(self, tmp_path):
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        root = str(tmp_path / "scene")
        generate_synthetic_scene(root, n_views=3, n_times=2, image_size=16)
        scene = load_dnerf_scene(root, eval_split=True)
        # generator holds out view 1 of 3 -> 2 views x 2 times train
        assert len(scene.train) == 4
        assert len(scene.test) == 2
        assert scene.point_cloud.points.shape == (2000, 3)
        assert np.all(np.abs(scene.point_cloud.points) <= 1.3)
        assert len(scene.video) == 80
        assert scene.maxtime == 1.0


class TestDynerf:
    def _make(self, tmp_path, n_cams=3, n_frames=4):
        root = str(tmp_path)
        poses = np.zeros((n_cams, 3, 5))
        for i in range(n_cams):
            poses[i, :, :3] = np.eye(3)
            poses[i, :, 3] = [0.2 * i, 0.0, 1.0]
            poses[i, :, 4] = [48, 64, 50.0]       # h, w, focal
        bounds = np.tile([0.1, 10.0], (n_cams, 1))
        np.save(os.path.join(root, "poses_bounds.npy"),
                np.concatenate([poses.reshape(n_cams, 15), bounds], axis=1))
        for i in range(n_cams):
            d = os.path.join(root, f"cam{i:02d}", "images")
            os.makedirs(d)
            for t in range(n_frames):
                open(os.path.join(d, f"{t:04d}.png"), "wb").close()
        return root

    def test_split_and_times(self, tmp_path):
        root = self._make(tmp_path)
        scene = load_dynerf_scene(root, eval_index=0)
        assert len(scene.test) == 4               # all frames of cam00
        assert len(scene.train) == 8
        times = sorted({r.camera.time for r in scene.train})
        np.testing.assert_allclose(times, [0, 1 / 300, 2 / 300, 3 / 300])
        assert scene.train[0].camera.width == 64
        assert scene.train[0].camera.height == 48


class TestHypernerf:
    def _make(self, tmp_path, n=8):
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "camera"))
        os.makedirs(os.path.join(root, "rgb", "2x"))
        ids = [f"{i:06d}" for i in range(n)]
        json.dump({"ids": ids, "val_ids": [], "train_ids": []},
                  open(os.path.join(root, "dataset.json"), "w"))
        json.dump({i: {"warp_id": k, "camera_id": 0, "appearance_id": k}
                   for k, i in enumerate(ids)},
                  open(os.path.join(root, "metadata.json"), "w"))
        json.dump({"center": [0.0, 0.0, 0.0], "scale": 1.0,
                   "near": 0.1, "far": 10.0},
                  open(os.path.join(root, "scene.json"), "w"))
        for k, i in enumerate(ids):
            json.dump({
                "orientation": np.eye(3).tolist(),
                "position": [0.1 * k, 0.0, -2.0],
                "focal_length": 100.0,
                "principal_point": [32.0, 24.0],
                "image_size": [64, 48],
                "skew": 0.0, "pixel_aspect_ratio": 1.0,
                "radial_distortion": [0, 0, 0],
                "tangential_distortion": [0, 0],
            }, open(os.path.join(root, "camera", f"{i}.json"), "w"))
            open(os.path.join(root, "rgb", "2x", f"{i}.png"), "wb").close()
        np.save(os.path.join(root, "points.npy"),
                np.random.default_rng(0).normal(size=(10, 3)))
        return root

    def test_default_split_every_fourth(self, tmp_path):
        root = self._make(tmp_path, n=8)
        scene = load_hypernerf_scene(root, ratio=0.5)
        # i_train = [0, 4], i_test = [2] ((i_train + 2)[:-1])
        assert len(scene.train) == 2
        assert len(scene.test) == 1
        assert scene.train[0].camera.width == 32    # 64 * ratio
        assert scene.train[1].camera.time == pytest.approx(4 / 7)
        assert scene.point_cloud.points.shape == (10, 3)


def test_registry_names_match_reference():
    assert set(scene_load_callbacks) == {"Colmap", "Blender", "dynerf", "nerfies"}


@pytest.mark.slow
class TestFitLegacyCLI:
    def test_blender_fit_end_to_end(self, tmp_path):
        """In-process main(argv) — one jax runtime, no interpreter spawn
        (the old subprocess form was the suite's recurring contention
        flake)."""
        import importlib
        import sys

        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        scene = str(tmp_path / "scene")
        out = str(tmp_path / "out")
        generate_synthetic_scene(scene, n_views=4, n_times=2, image_size=48)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        fit_legacy = importlib.import_module("fit_legacy")
        fit_legacy.main(["-s", scene, "-m", out, "--type", "Blender", "-w",
                         "--iterations", "30", "--sh_degree", "1",
                         "--k_cap", "64"])
        assert os.path.exists(os.path.join(out, "point_cloud.ply"))
        with open(os.path.join(out, "results.json")) as f:
            res = json.load(f)
        assert res["ours_static"]["PSNR"] > 5.0


def test_images_text_with_empty_track_lines(tmp_path):
    """Regression: COLMAP writes a BLANK 2D-point line for images with zero
    observations; the pairing parity must survive it."""
    from cloth_splatting_tpu.data.legacy import read_colmap_images_text

    path = str(tmp_path / "images.txt")
    with open(path, "w") as f:
        f.write("# Image list\n")
        f.write("1 1 0 0 0 0.1 0.2 2.0 1 a.png\n")
        f.write("\n")                                   # zero-point track
        f.write("2 1 0 0 0 0.3 0.4 2.0 1 b.png\n")
        f.write("1.0 2.0 -1 3.0 4.0 7\n")
    imgs = read_colmap_images_text(path)
    assert set(imgs) == {1, 2}
    assert imgs[2]["name"] == "b.png"
    np.testing.assert_allclose(imgs[2]["tvec"], [0.3, 0.4, 2.0])
