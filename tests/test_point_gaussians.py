"""Free-xyz point-cloud Gaussian model tests
(reference scene_reconstruction/gaussian_model.py:25-430)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.models import point_gaussians as PG


def _cloud(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.3, size=(n, 3)).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    return pts, colors, rng


class TestInit:
    def test_init_parity(self):
        pts, colors, rng = _cloud()
        params, state = PG.init_from_point_cloud(rng, pts, colors, 3,
                                                 capacity=128)
        assert params.xyz.shape == (128, 3)
        np.testing.assert_allclose(np.asarray(params.xyz[:64]), pts, atol=1e-6)
        assert int(state.alive.sum()) == 64
        # opacity = sigmoid^-1(0.1)
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(params.opacity[:64])), 0.1, atol=1e-5)
        # scales isotropic from mean 3-NN distance
        s = np.asarray(PG.get_scaling(params)[:64])
        assert np.all(s > 0)
        np.testing.assert_allclose(s[:, 0], s[:, 1])
        # SH DC encodes the colors
        from cloth_splatting_tpu.ops.sh import rgb_to_sh
        np.testing.assert_allclose(np.asarray(params.features_dc[:64, 0]),
                                   np.asarray(rgb_to_sh(jnp.asarray(colors))),
                                   atol=1e-5)


class TestDensityControl:
    def test_clone_fills_free_slots(self):
        pts, colors, rng = _cloud(16)
        params, state = PG.init_from_point_cloud(rng, pts, colors, 1,
                                                 capacity=64)
        grads = jnp.where(jnp.arange(64) < 4, 1.0, 0.0)
        res = PG.densify_clone(params, state, grads, 0.5, 0.01, 100.0)
        assert int(res.state.alive.sum()) == 20
        assert int(res.overflow) == 0
        # clones inherit parent xyz
        clone_rows = np.asarray(res.state.alive & ~np.asarray(state.alive))
        cloned_xyz = np.asarray(res.params.xyz)[clone_rows]
        for row in cloned_xyz:
            assert np.min(np.linalg.norm(pts[:4] - row, axis=1)) < 1e-6

    def test_split_shrinks_scales(self):
        pts, colors, rng = _cloud(16)
        params, state = PG.init_from_point_cloud(rng, pts, colors, 1,
                                                 capacity=64)
        grads = jnp.where(jnp.arange(64) < 3, 1.0, 0.0)
        before = np.asarray(PG.get_scaling(params))[:3]
        res = PG.densify_split(params, state, grads, 0.5, 0.0, 1e-6,
                               jax.random.PRNGKey(0))
        assert int(res.state.alive.sum()) == 19
        after = np.asarray(PG.get_scaling(res.params))[:3]
        np.testing.assert_allclose(after, before / 1.6, rtol=1e-5)

    def test_prune_and_reset(self):
        pts, colors, rng = _cloud(16)
        params, state = PG.init_from_point_cloud(rng, pts, colors, 1,
                                                 capacity=32)
        low = params.opacity.at[:5].set(PG.inverse_sigmoid(jnp.asarray(1e-4)))
        params = params._replace(opacity=low)
        state2 = PG.prune(params, state, min_opacity=0.005, scene_extent=1.0,
                          max_screen_size=None)
        assert int(state2.alive.sum()) == 11
        params2 = PG.reset_opacity(params)
        assert float(jax.nn.sigmoid(params2.opacity).max()) <= 0.01 + 1e-6


class TestRenderAndFit:
    def _scene(self, n=48, size=32):
        from cloth_splatting_tpu.data.synthetic import orbit_camera
        from cloth_splatting_tpu.render import camera_arrays
        fov = 2 * np.arctan(0.4)
        cams = [camera_arrays(orbit_camera(v, 4, fov, size, size, 0.0))
                for v in range(4)]
        return cams, fov, size

    def test_render_shape_and_finiteness(self):
        pts, colors, rng = _cloud(32)
        params, state = PG.init_from_point_cloud(rng, pts, colors, 2)
        cams, fov, size = self._scene()
        rgb, depth, radii = PG.render_points(
            params, state, cams[0], size, size, np.tan(fov / 2),
            np.tan(fov / 2), jnp.zeros(3), 2, k_cap=64, k_chunk=16)
        assert rgb.shape == (3, size, size)
        assert np.all(np.isfinite(np.asarray(rgb)))
        assert (np.asarray(radii) > 0).sum() > 0

    @pytest.mark.slow
    def test_static_fit_reduces_loss(self):
        from cloth_splatting_tpu.data.legacy import PointCloud
        pts, colors, rng = _cloud(48)
        cams, fov, size = self._scene()
        # ground truth: render a reference cloud, then fit a perturbed one
        tgt_params, tgt_state = PG.init_from_point_cloud(rng, pts, colors, 1)
        gts = [PG.render_points(tgt_params, tgt_state, c, size, size,
                                np.tan(fov / 2), np.tan(fov / 2),
                                jnp.zeros(3), 1, k_cap=64)[0] for c in cams]
        noisy = PointCloud(pts + rng.normal(0, 0.03, pts.shape).astype(np.float32),
                           colors, np.zeros_like(pts))
        _, _, loss_end = PG.fit_static_scene(
            cams, gts, noisy, size, size, np.tan(fov / 2), np.tan(fov / 2),
            sh_degree=1, iterations=60, k_cap=64)
        # compare against the un-trained loss
        p0, s0 = PG.init_from_point_cloud(
            np.random.default_rng(0), noisy.points, colors, 1)
        from cloth_splatting_tpu.train.losses import image_losses
        rgb0 = PG.render_points(p0, s0, cams[0], size, size, np.tan(fov / 2),
                                np.tan(fov / 2), jnp.zeros(3), 1, k_cap=64)[0]
        loss0, _ = image_losses(rgb0[None], gts[0][None], 0.2)
        assert loss_end < float(loss0)
