"""Rasterizer tests: tiled XLA kernel vs per-pixel oracle + gradient checks
(SURVEY.md section 4 layer 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.ops.camera import Camera
from cloth_splatting_tpu.ops.projection import build_covariance, project_gaussians
from cloth_splatting_tpu.ops.quaternion import quat_normalize
from cloth_splatting_tpu.ops.rasterize import rasterize_reference, rasterize_tiled

W = H = 64
TANX = TANY = 0.5


def make_camera():
    return Camera.create(R=np.eye(3), t=np.asarray([0.0, 0.0, 4.0]),
                         fovx=2 * np.arctan(TANX), fovy=2 * np.arctan(TANY),
                         width=W, height=H)


def random_scene(n, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-spread, spread, (n, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-3.5, -2.0, (n, 3))), jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32)
    return means, scales, quats, colors, opac


def project_scene(n=64, seed=0, spread=1.0):
    cam = make_camera()
    means, scales, quats, colors, opac = random_scene(n, seed, spread)
    cov = build_covariance(scales, quats)
    return project_gaussians(
        means, cov, colors, opac,
        jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
        W, H, TANX, TANY,
    )


BG = jnp.asarray([1.0, 1.0, 1.0])


class TestParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_tiled_matches_oracle(self, seed):
        proj = project_scene(n=96, seed=seed)
        rgb_o, dep_o, acc_o = rasterize_reference(proj, W, H, BG)
        rgb_t, dep_t, acc_t, aux = rasterize_tiled(proj, W, H, BG, k_cap=128, k_chunk=16)
        assert int(aux.n_dropped) == 0
        np.testing.assert_allclose(rgb_t, rgb_o, atol=2e-5)
        np.testing.assert_allclose(dep_t, dep_o, atol=2e-4)
        np.testing.assert_allclose(acc_t, acc_o, atol=2e-5)

    def test_background_only(self):
        proj = project_scene(n=8, seed=3)
        proj = proj._replace(valid=jnp.zeros_like(proj.valid))
        rgb, dep, acc, _ = rasterize_tiled(proj, W, H, BG, k_cap=32, k_chunk=8)
        np.testing.assert_allclose(rgb, jnp.ones_like(rgb), atol=1e-6)
        np.testing.assert_allclose(acc, 0.0, atol=1e-6)

    def test_behind_camera_culled(self):
        cam = make_camera()
        means = jnp.asarray([[0.0, 0.0, 10.0]])  # behind (camera looks at -z... depends)
        # place a gaussian behind the camera plane: camera at z=-4 looking at +z,
        # so world z < -4 is behind.
        means = jnp.asarray([[0.0, 0.0, -10.0]])
        cov = build_covariance(jnp.full((1, 3), 0.05), jnp.asarray([[1.0, 0, 0, 0]]))
        proj = project_gaussians(means, cov, jnp.ones((1, 3)), jnp.ones((1,)),
                                 jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
                                 W, H, TANX, TANY)
        assert not bool(proj.valid[0])

    def test_depth_ordering_occlusion(self):
        """A near-opaque front gaussian must hide one behind it."""
        cam = make_camera()
        means = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])  # z=0 nearer to cam at -4
        scales = jnp.full((2, 3), 0.3)
        quats = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
        colors = jnp.asarray([[1.0, 0, 0], [0.0, 1.0, 0]])
        opac = jnp.asarray([0.99, 0.99])
        cov = build_covariance(scales, quats)
        proj = project_gaussians(means, cov, colors, opac,
                                 jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
                                 W, H, TANX, TANY)
        rgb, _, _, _ = rasterize_tiled(proj, W, H, jnp.zeros(3), k_cap=32, k_chunk=8)
        center = rgb[:, H // 2, W // 2]
        assert float(center[0]) > 0.8  # red in front
        assert float(center[1]) < 0.2  # green occluded

    def test_kcap_overflow_reported(self):
        proj = project_scene(n=256, seed=4, spread=0.2)  # everything piles center
        _, _, _, aux = rasterize_tiled(proj, W, H, BG, k_cap=32, k_chunk=8)
        assert int(aux.n_dropped) > 0


class TestGradients:
    def _loss_fn(self, raster):
        def loss(means, scales, quats, colors, opac):
            cam = make_camera()
            cov = build_covariance(scales, quat_normalize(quats))
            proj = project_gaussians(means, cov, colors, opac,
                                     jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
                                     W, H, TANX, TANY)
            if raster == "tiled":
                rgb, dep, acc, _ = rasterize_tiled(proj, W, H, BG, k_cap=64, k_chunk=8)
            else:
                rgb, dep, acc = rasterize_reference(proj, W, H, BG)
            target = jnp.zeros_like(rgb).at[0].set(1.0)
            return jnp.mean((rgb - target) ** 2) + 0.1 * jnp.mean(dep)
        return loss

    def test_grads_match_oracle(self):
        means, scales, quats, colors, opac = random_scene(24, seed=5)
        args = (means, scales, quats, colors, opac)
        g_t = jax.grad(self._loss_fn("tiled"), argnums=(0, 1, 2, 3, 4))(*args)
        g_o = jax.grad(self._loss_fn("oracle"), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g_t, g_o):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-2)

    @pytest.mark.slow
    def test_grads_match_finite_differences(self):
        """Spot-check analytic grads vs central differences on a few coords."""
        means, scales, quats, colors, opac = random_scene(8, seed=6)
        loss = self._loss_fn("tiled")
        g = jax.grad(loss, argnums=0)(means, scales, quats, colors, opac)
        rng = np.random.default_rng(0)
        eps = 3e-3
        checked = 0
        for _ in range(6):
            i, j = rng.integers(0, 8), rng.integers(0, 3)
            dm = means.at[i, j].add(eps)
            dm2 = means.at[i, j].add(-eps)
            fd = (loss(dm, scales, quats, colors, opac)
                  - loss(dm2, scales, quats, colors, opac)) / (2 * eps)
            an = float(g[i, j])
            if abs(fd) < 1e-6 and abs(an) < 1e-6:
                continue
            np.testing.assert_allclose(an, float(fd), rtol=0.1, atol=1e-4)
            checked += 1
        assert checked >= 2

    def test_nonzero_grads_flow_to_all_params(self):
        means, scales, quats, colors, opac = random_scene(24, seed=7)
        grads = jax.grad(self._loss_fn("tiled"), argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, colors, opac)
        for g in grads:
            assert float(jnp.max(jnp.abs(g))) > 0.0


class TestSplatRadiusCap:
    """MAX_SPLAT_RADIUS quantification (VERDICT weak #4): the cap shrinks
    oversized support ellipses; an uncapped path exists (max_radius=None)
    and the cap's PSNR impact is bounded on bench-like scenes."""

    def _project(self, means, scales, quats, colors, opac, max_radius):
        cam = make_camera()
        cov = build_covariance(scales, quats)
        return project_gaussians(
            means, cov, colors, opac,
            jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
            W, H, TANX, TANY, max_radius=max_radius)

    def test_uncapped_matches_oracle_for_huge_splats(self):
        """Close-up splats far beyond 24 px render EXACTLY when uncapped
        (tiled window sized to the radius), proving the slow exact path."""
        rng = np.random.default_rng(11)
        n = 16
        means = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32)
        scales = jnp.full((n, 3), -1.2, jnp.float32)   # huge on screen
        quats = quat_normalize(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        opac = jnp.asarray(rng.uniform(0.4, 0.9, (n,)), jnp.float32)

        proj_un = self._project(means, scales, quats, colors, opac, None)
        assert float(proj_un.radius.max()) > 24.0
        win = int(2 * float(proj_un.radius.max()) // 16 + 3)
        rgb_o, _, _ = rasterize_reference(proj_un, W, H, BG)
        rgb_t, _, _, aux = rasterize_tiled(proj_un, W, H, BG, win=win,
                                           k_cap=256, k_chunk=16)
        assert int(aux.n_dropped) == 0
        np.testing.assert_allclose(np.asarray(rgb_t), np.asarray(rgb_o),
                                   atol=3e-4)

    @pytest.mark.slow
    def test_cap_psnr_impact_bounded_on_bench_scene(self):
        """On a bench-like cloth field the 24 px cap costs < 0.1 dB: the
        capped and uncapped renders agree to > 40 dB PSNR."""
        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        from cloth_splatting_tpu.data.synthetic import target_gaussians
        from cloth_splatting_tpu.models import gaussians as G
        from cloth_splatting_tpu.ops.image import psnr

        mesh = grid_cloth_mesh(16, 16, size=1.4)
        params, state = target_gaussians(mesh, 1)
        cam = make_camera()
        xyz = G.gaussian_positions(params, state, mesh)
        cov = build_covariance(G.get_scaling(params), params.rotation)
        colors = jnp.ones((xyz.shape[0], 3), jnp.float32) * 0.5
        op = G.get_opacity(params)

        def run(max_radius, win):
            proj = project_gaussians(
                xyz, cov, colors, op, jnp.asarray(cam.world_view),
                jnp.asarray(cam.full_proj), W, H, TANX, TANY,
                alive=state.alive, max_radius=max_radius)
            rgb, _, _, _ = rasterize_tiled(proj, W, H, BG, win=win,
                                           k_cap=512, k_chunk=32)
            return rgb

        rgb_cap = run(24.0, 5)
        rgb_un = run(None, 13)
        delta_psnr = float(psnr(rgb_cap, rgb_un))
        assert delta_psnr > 40.0, delta_psnr
