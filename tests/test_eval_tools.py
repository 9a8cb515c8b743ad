"""Eval tooling: tracking MTE, flow overlays, predictions bridge, configs,
checkpoint/resume, LPIPS plumbing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
from cloth_splatting_tpu.eval.flow_viz import davis_palette, draw_tracks, occlusion_mask
from cloth_splatting_tpu.eval.tracking import align_trajectories
from cloth_splatting_tpu.train.config import Config, load_config_file


class TestTracking:
    def test_perfect_tracking_zero_mte(self):
        rng = np.random.default_rng(0)
        traj = rng.random((5, 40, 3)).astype(np.float32)
        ident = np.zeros((5, 40, 4), np.float32)
        ident[..., 0] = 1.0
        aligned, mte = align_trajectories(traj, ident, traj)
        np.testing.assert_allclose(mte, 0.0, atol=1e-6)

    def test_offset_trajectories_matched(self):
        """GT = predictions shifted: after t0 alignment, MTE stays ~0 under
        pure translation."""
        rng = np.random.default_rng(1)
        pred = rng.random((4, 30, 3)).astype(np.float32)
        shift = np.asarray([0.01, 0.02, -0.01], np.float32)
        gt = pred + shift
        aligned, mte = align_trajectories(pred, None, gt)
        np.testing.assert_allclose(mte, 0.0, atol=1e-5)

    def test_rotation_transport(self):
        """A rotating rigid offset is compensated by rotation transport."""
        from cloth_splatting_tpu.ops.quaternion import axis_angle_to_quat, quat_to_rotmat

        t_steps, m = 6, 10
        rng = np.random.default_rng(2)
        centers = rng.random((m, 3)).astype(np.float32)
        offsets = rng.normal(0, 0.05, (m, 3)).astype(np.float32)
        axis = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (m, 1))
        pred = np.zeros((t_steps, m, 3), np.float32)
        rot = np.zeros((t_steps, m, 4), np.float32)
        gt = np.zeros((t_steps, m, 3), np.float32)
        for t in range(t_steps):
            ang = 0.2 * t * np.ones(m, np.float32)
            q = np.asarray(axis_angle_to_quat(jnp.asarray(axis), jnp.asarray(ang)))
            r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
            pred[t] = centers
            rot[t] = q
            gt[t] = centers + np.einsum("mij,mj->mi", r, offsets)
        aligned, mte = align_trajectories(pred, rot, gt)
        assert mte.mean() < 1e-4


class TestMTEDecompose:
    def test_known_fit_error(self, tmp_path):
        """Predicted trajectories lag the GT motion by a constant 5 mm in x:
        the decomposition must attribute exactly that to fit error, with a
        near-zero match offset."""
        import contextlib
        import io
        import json
        import sys

        rng = np.random.default_rng(0)
        t_steps, m = 4, 50
        gt0 = rng.uniform(-1, 1, (m, 3))
        disp = rng.normal(0, 0.05, (t_steps, 1, 3))
        disp[0] = 0.0
        gt = gt0[None] + disp
        lag = np.zeros((t_steps, 1, 3))
        lag[1:, 0, 0] = 0.005
        pred = gt - lag                                # same points, lagged
        trajs = tmp_path / "all_trajs.npz"
        gtf = tmp_path / "gt.npz"
        np.savez(trajs, traj=pred)
        np.savez(gtf, traj=gt)

        scripts = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts")
        sys.path.insert(0, scripts)
        try:
            import mte_decompose
        finally:
            sys.path.remove(scripts)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            mte_decompose.main(["--trajs", str(trajs), "--gt", str(gtf)])
        out = json.loads(buf.getvalue())
        # mean over T of |lag|: 3 of 4 steps lag 5 mm -> 3.75 mm
        assert abs(out["mte_fit_true_transport"] - 3.75) < 0.01, out
        assert out["match_offset_mean"] < 1e-6
        assert abs(out["mte_translation_only"] - 3.75) < 0.01, out


class TestFlowViz:
    def test_palette_and_draw(self):
        img = np.zeros((32, 32, 3), np.uint8)
        tracks = [np.asarray([[5.0, 5.0], [20.0, 20.0]]),
                  np.asarray([[8.0, 8.0], [22.0, 18.0]])]
        vis = np.asarray([True, True])
        out = draw_tracks(img, tracks, vis)
        assert out.sum() > 0
        assert davis_palette(25).shape == (25, 3)

    def test_occlusion_mask(self):
        depth = np.full((1, 16, 16), 2.0, np.float32)
        proj = np.asarray([[8.0, 8.0], [8.0, 8.0], [100.0, 8.0]])
        pdepth = np.asarray([1.9, 3.0, 1.0])
        mask = occlusion_mask(proj, pdepth, depth)
        assert mask.tolist() == [True, False, False]


class TestPredictionsBridge:
    def test_save_and_reload_scene_meshes(self, tmp_path):
        from cloth_splatting_tpu.data.predictions import save_mesh_predictions
        from cloth_splatting_tpu.data.mesh_io import load_mesh_h5

        mesh = grid_cloth_mesh(5, 5)
        faces = np.asarray(mesh.faces)
        pos = np.asarray(mesh.pos)
        traj = np.stack([pos + 0.1 * t for t in range(3)])
        save_mesh_predictions(str(tmp_path), faces, traj)
        init = load_mesh_h5(str(tmp_path / "init_mesh.hdf5"))
        np.testing.assert_allclose(np.asarray(init.pos), traj[0], atol=1e-6)
        m2 = load_mesh_h5(str(tmp_path / "mesh_predictions" / "mesh_002.hdf5"))
        np.testing.assert_allclose(np.asarray(m2.pos), traj[2], atol=1e-6)

    def test_noisy_gt_ablation(self, tmp_path):
        from cloth_splatting_tpu.data.predictions import generate_noisy_gt_predictions

        mesh = grid_cloth_mesh(4, 4)
        pos = np.asarray(mesh.pos)
        traj = np.stack([pos + 0.05 * t for t in range(4)])
        out = generate_noisy_gt_predictions(str(tmp_path), np.asarray(mesh.faces),
                                            traj, noise_std=0.001)
        assert out.shape == traj.shape
        assert not np.allclose(out, traj)   # noisy
        assert np.abs(out - traj).max() < 0.2


class TestConfig:
    def test_load_reference_style_config(self):
        cfg = Config()
        path = "cloth_splatting_tpu/configs/cloth_splatting/default.py"
        cfg = load_config_file(cfg, path)
        assert cfg.opt.static_reconst is True
        assert cfg.opt.static_reconst_iteration == 1500
        assert cfg.opt.lambda_dssim == 0.05
        assert cfg.opt.densify_until_iter == 4500
        assert cfg.model.sh_degree == 3

    def test_defaults_match_reference(self):
        cfg = Config()
        assert cfg.opt.iterations == 8000
        assert cfg.opt.position_lr_init == 0.00016
        assert cfg.opt.feature_lr == 0.0025
        assert cfg.opt.opacity_lr == 0.05
        assert cfg.opt.lambda_rigid == 0.3
        assert cfg.opt.lambda_deform_mag == 0.01
        assert cfg.opt.lambda_momentum == 0.1
        assert cfg.meshnet.lr_init == 3e-4


class TestCheckpointResume:
    def test_full_state_roundtrip(self, tmp_path):
        from cloth_splatting_tpu.models import gaussians as G
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.loop import (
            load_train_checkpoint,
            save_train_checkpoint,
        )
        from cloth_splatting_tpu.train.step import Trainer

        mesh = grid_cloth_mesh(5, 5)
        cfg = Config()
        cfg.opt.raster_k_cap = 64
        preds = jnp.tile(mesh.pos[None], (2, 1, 1))
        trainer = Trainer(cfg, mesh, preds, 32, 32, 0.4, 0.4, 1.0)
        rng = np.random.default_rng(0)
        state = trainer.init_state(rng)
        state = state._replace(step=jnp.asarray(17, jnp.int32))
        path = save_train_checkpoint(str(tmp_path), 17, state)

        fresh = trainer.init_state(np.random.default_rng(1))
        restored = load_train_checkpoint(path, fresh)
        assert int(restored.step) == 17
        np.testing.assert_allclose(np.asarray(restored.params.face_bary),
                                   np.asarray(state.params.face_bary))
        np.testing.assert_allclose(np.asarray(restored.sim_params.w_out),
                                   np.asarray(state.sim_params.w_out))


class TestLPIPS:
    def test_architecture_with_random_weights(self):
        """Plumbing check: random weights through the VGG16 feature stack."""
        from cloth_splatting_tpu.eval import lpips_jax

        rng = np.random.default_rng(0)
        weights = {}
        c_in = 3
        for b, (c_out, n_convs) in enumerate(lpips_jax.VGG_BLOCKS):
            for i in range(n_convs):
                weights[f"conv_{b}_{i}_w"] = jnp.asarray(
                    rng.normal(0, 0.05, (3, 3, c_in, c_out)), jnp.float32)
                weights[f"conv_{b}_{i}_b"] = jnp.zeros(c_out)
                c_in = c_out
            weights[f"lin_{b}"] = jnp.asarray(np.abs(rng.normal(0, 1, c_out)),
                                              jnp.float32)
        a = jnp.asarray(rng.random((1, 3, 64, 64)), jnp.float32)
        b = jnp.asarray(rng.random((1, 3, 64, 64)), jnp.float32)
        d_ab = float(lpips_jax.lpips(weights, a, b)[0])
        d_aa = float(lpips_jax.lpips(weights, a, a)[0])
        assert d_aa < 1e-6
        assert d_ab > d_aa


class TestLpipsFixture:
    def test_fixture_deterministic_and_sane(self):
        import jax.numpy as jnp

        from cloth_splatting_tpu.eval import lpips_jax

        w1 = lpips_jax.fixture_weights()
        w2 = lpips_jax.fixture_weights()
        np.testing.assert_array_equal(w1["conv_0_0_w"], w2["conv_0_0_w"])
        # identical images -> 0; distorted -> positive, monotone-ish
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64)), jnp.float32)
        d0 = float(lpips_jax.lpips(w1, img, img)[0])
        noise = jnp.asarray(rng.normal(0, 1, img.shape), jnp.float32)
        d_small = float(lpips_jax.lpips(w1, img, img + 0.05 * noise)[0])
        d_big = float(lpips_jax.lpips(w1, img, img + 0.2 * noise)[0])
        assert d0 < 1e-6
        assert 0 < d_small < d_big


class TestLpipsFixtureGolden:
    """Pin exact fixture-LPIPS values so the metric is stable across
    releases: fixture numbers are self-consistent (comparable run-to-run in
    THIS framework) but NOT comparable to published VGG-LPIPS — that needs
    the offline exporter (scripts/export_lpips_weights.py; README scoping)."""

    def test_golden_values(self):
        import jax.numpy as jnp

        from cloth_splatting_tpu.eval import lpips_jax

        w = lpips_jax.fixture_weights()
        rng = np.random.default_rng(42)
        a = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)), jnp.float32)
        np.testing.assert_allclose(float(lpips_jax.lpips(w, a, b)[0]),
                                   0.019195334985852240, rtol=1e-4)
        c = jnp.zeros((1, 3, 32, 32), jnp.float32)
        d = jnp.ones((1, 3, 32, 32), jnp.float32)
        np.testing.assert_allclose(float(lpips_jax.lpips(w, c, d)[0]),
                                   0.027712207287549973, rtol=1e-4)


class TestMetricsCLI:
    """metrics.py evaluate(): reference results.json schema on the test
    split; --splits train namespaces extra splits without disturbing it."""

    @staticmethod
    def _write_split(model, split, val):
        d = os.path.join(model, split, "ours_10")
        os.makedirs(os.path.join(d, "renders"))
        os.makedirs(os.path.join(d, "gt"))
        from PIL import Image
        img = (np.full((32, 32, 3), val, np.float32) * 255).astype(np.uint8)
        for name in ("00000.png", "00001.png"):
            Image.fromarray(img).save(os.path.join(d, "renders", name))
            Image.fromarray(img).save(os.path.join(d, "gt", name))

    def test_splits_namespacing(self, tmp_path):
        import json

        import metrics as metrics_cli

        model = str(tmp_path / "exp")
        self._write_split(model, "test", 0.25)
        self._write_split(model, "train", 0.75)
        metrics_cli.main(["-m", model, "--splits", "test", "train"])
        with open(os.path.join(model, "results.json")) as f:
            res = json.load(f)
        assert set(res) == {"ours_10", "train/ours_10"}
        # identical renders/gt: PSNR capped at the implementation's inf-guard
        assert res["ours_10"]["PSNR"] > 60
        assert res["train/ours_10"]["PSNR"] > 60
        # default invocation keeps the reference schema (test only)
        metrics_cli.main(["-m", model])
        with open(os.path.join(model, "results.json")) as f:
            assert set(json.load(f)) == {"ours_10"}
