"""Pallas rasterizer vs oracle, in interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.ops.rasterize import rasterize_reference
from cloth_splatting_tpu.ops.rasterize.pallas_tiled import rasterize_pallas

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_rasterize import project_scene, W, H  # noqa: E402


class TestPallasParity:
    @pytest.mark.parametrize("seed", [0, 2])
    def test_matches_oracle(self, seed):
        proj = project_scene(n=64, seed=seed)
        rgb_o, dep_o, acc_o = rasterize_reference(proj, W, H, jnp.ones(3))
        rgb_p, dep_p, acc_p, _ = rasterize_pallas(
            proj, W, H, bg_static=(1.0, 1.0, 1.0), interpret=True)
        # early transmittance exit truncates invisible tails -> small tolerance
        np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_o), atol=3e-4)
        np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_o), atol=3e-4)
        np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_o), atol=3e-3)

    def test_empty_scene(self):
        proj = project_scene(n=8, seed=1)
        proj = proj._replace(valid=jnp.zeros_like(proj.valid))
        rgb, dep, acc, _ = rasterize_pallas(proj, W, H, (0.5, 0.5, 0.5),
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(rgb), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)

    def test_far_tile_small_sigma_precision(self):
        """Monomial-compositor precision guard: a ~0.7 px sigma Gaussian in
        the far corner of an 800px frame. The P @ C quadratic is evaluated
        in tile-LOCAL coordinates; with absolute coords the x^2-scale
        coefficient products reach ~7e6 and f32 cancellation corrupts
        log-alpha by O(1) exactly in this configuration (sharp splat, far
        from the origin). Verifies the composited splat matches the dense
        oracle to sub-quantization accuracy."""
        from cloth_splatting_tpu.ops.projection import ProjectedGaussians

        w = h = 800
        proj = ProjectedGaussians(
            xy=jnp.asarray([[790.3, 789.7]], jnp.float32),
            depth=jnp.asarray([2.0], jnp.float32),
            conic=jnp.asarray([[2.0, 0.3, 2.2]], jnp.float32),
            radius=jnp.asarray([3.0], jnp.float32),
            color=jnp.asarray([[0.9, 0.2, 0.6]], jnp.float32),
            opacity=jnp.asarray([0.85], jnp.float32),
            valid=jnp.ones((1,), bool),
            power_cut=jnp.full((1,), -4.5, jnp.float32),
        )
        rgb_o, dep_o, acc_o = rasterize_reference(proj, w, h, jnp.zeros(3))
        rgb_p, dep_p, acc_p, _ = rasterize_pallas(
            proj, w, h, bg_static=(0.0, 0.0, 0.0), interpret=True)
        sl = np.s_[:, 780:800, 780:800]
        np.testing.assert_allclose(np.asarray(rgb_p)[sl],
                                   np.asarray(rgb_o)[sl], atol=2e-3)
        np.testing.assert_allclose(np.asarray(acc_p)[0, 780:800, 780:800],
                                   np.asarray(acc_o)[0, 780:800, 780:800],
                                   atol=2e-3)

    def test_adversarial_depth_span(self):
        """Thin layers at close separation plus a distant background: depth
        ordering must stay exact (the sort key is true f32 depth, not a
        quantized bucket), so the composited image matches the oracle."""
        import jax.numpy as jnp
        from cloth_splatting_tpu.ops.projection import ProjectedGaussians

        rng = np.random.default_rng(7)
        n = 128
        xy = jnp.asarray(rng.uniform(8, W - 8, (n, 2)), jnp.float32)
        # depths: pairs separated by 1e-4 around 1.0, plus a background at 1e3
        base = jnp.asarray(
            np.concatenate([
                1.0 + rng.uniform(0, 1e-3, n // 2),
                np.full(n // 2, 1e3, np.float32),
            ]), jnp.float32)
        conic = jnp.broadcast_to(jnp.asarray([0.05, 0.0, 0.05]), (n, 3))
        proj = ProjectedGaussians(
            xy=xy, depth=base, conic=conic,
            # support radius must cover the -4.5 power cutoff: 3*sigma =
            # 3/sqrt(0.05) = 13.4 px (projection guarantees this invariant)
            radius=jnp.full((n,), 14.0, jnp.float32),
            color=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
            opacity=jnp.asarray(rng.uniform(0.5, 0.95, (n,)), jnp.float32),
            valid=jnp.ones((n,), bool),
            power_cut=jnp.full((n,), -4.5, jnp.float32),
        )
        rgb_o, dep_o, acc_o = rasterize_reference(proj, W, H, jnp.ones(3))
        rgb_p, dep_p, acc_p, _ = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0),
                                                  interpret=True)
        np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_o),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_o),
                                   atol=3e-4)

    def test_big_cap_overflow_shrinks_support(self):
        """More oversized splats than the big-stream cap: the excess get
        their support ellipse shrunk (power_cut rescaled), never dropped —
        every pixel inside the shrunk span still matches the oracle given
        the same shrunken projection."""
        proj = project_scene(n=64, seed=4, spread=0.4)  # big overlapping splats
        rgb_full, _, _, _ = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0),
                                             interpret=True)
        rgb_cap, _, _, aux = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0),
                                              interpret=True, big_cap=4)
        # the capped render differs (support shrunk) but stays finite and
        # close in aggregate: shrunk splats keep >= their 2-tile core
        assert np.isfinite(np.asarray(rgb_cap)).all()
        diff = float(jnp.abs(rgb_cap - rgb_full).mean())
        assert diff < 0.15, diff
        # no silent truncation accounting: aux reports zero dropped
        assert int(aux.n_dropped) == 0


class TestPackOrder:
    """'fused' single-i32-key binning (tile major, truncated-float-depth
    minor — the CUDA radix-key semantics) vs the 'exact' lexicographic sort:
    same images wherever depths are separated by more than the key quantum."""

    def test_depth_bits_layout(self):
        from cloth_splatting_tpu.ops.rasterize.pallas_tiled import (
            fused_depth_bits,
        )

        for n_tiles in (16, 625, 2500):
            bits = fused_depth_bits(n_tiles)
            # sentinel tile (= n_tiles) with all depth bits set must fit i32
            assert (n_tiles << bits) | ((1 << bits) - 1) < 2 ** 31
            assert bits >= 18  # tens-of-bits depth resolution at any real size

    @pytest.mark.parametrize("seed", [0, 2, 5])
    def test_fused_matches_exact(self, seed):
        proj = project_scene(n=96, seed=seed)
        out_e = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0), interpret=True,
                                 pack_order="exact")
        out_f = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0), interpret=True,
                                 pack_order="fused")
        for name, a, b in zip(("rgb", "dep", "acc"), out_e[:3], out_f[:3]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5, err_msg=name)

    def test_fused_grads_match_oracle(self):
        import jax

        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            rasterize_pallas_grad,
        )

        proj = project_scene(n=48, seed=0)
        tgt = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (3, H, W)), jnp.float32)

        def loss_oracle(xy, color, op):
            p = proj._replace(xy=xy, color=color, opacity=op)
            rgb, _, _ = rasterize_reference(p, W, H, jnp.ones(3))
            return jnp.mean((rgb - tgt) ** 2)

        def loss_fused(xy, color, op):
            p = proj._replace(xy=xy, color=color, opacity=op)
            rgb, _, _ = rasterize_pallas_grad(p, W, H, (1.0, 1.0, 1.0),
                                              interpret=True,
                                              pack_order="fused")
            return jnp.mean((rgb - tgt) ** 2)

        args = (proj.xy, proj.color, proj.opacity)
        g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(*args)
        g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
        for name, a, b in zip(("xy", "color", "op"), g_o, g_f):
            scale = float(jnp.abs(a).max()) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-4 * scale, err_msg=name)


class TestPallasVJP:
    """Custom-VJP training tier: analytic backward kernel vs oracle autodiff
    (reference backward contract: grads to means2D/conic/color/opacity,
    SURVEY.md section 2.1 row 1)."""

    def _losses(self, proj, tgt):
        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            rasterize_pallas_grad,
        )

        def loss_oracle(xy, conic, color, op, depth):
            p = proj._replace(xy=xy, conic=conic, color=color, opacity=op,
                              depth=depth)
            rgb, dep, acc = rasterize_reference(p, W, H, jnp.ones(3))
            return (jnp.mean((rgb - tgt) ** 2) + 0.1 * jnp.mean(dep)
                    + 0.05 * jnp.mean(acc))

        def loss_pallas(xy, conic, color, op, depth):
            p = proj._replace(xy=xy, conic=conic, color=color, opacity=op,
                              depth=depth)
            rgb, dep, acc = rasterize_pallas_grad(p, W, H, (1.0, 1.0, 1.0),
                                                  interpret=True)
            return (jnp.mean((rgb - tgt) ** 2) + 0.1 * jnp.mean(dep)
                    + 0.05 * jnp.mean(acc))

        return loss_oracle, loss_pallas

    @pytest.mark.parametrize("seed", [0, 2])
    def test_grads_match_oracle(self, seed):
        import jax

        proj = project_scene(n=48, seed=seed)
        tgt = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (3, H, W)), jnp.float32)
        loss_o, loss_p = self._losses(proj, tgt)
        args = (proj.xy, proj.conic, proj.color, proj.opacity, proj.depth)
        np.testing.assert_allclose(float(loss_o(*args)), float(loss_p(*args)),
                                   rtol=1e-5)
        g_o = jax.grad(loss_o, argnums=(0, 1, 2, 3, 4))(*args)
        g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(("xy", "conic", "color", "op", "depth"),
                              g_o, g_p):
            scale = float(jnp.abs(a).max()) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-4 * scale, err_msg=name)

    def test_train_step_pallas_backend(self):
        """One splat train step through the Pallas custom-VJP path (interpret
        mode on CPU) produces finite loss and updates parameters."""
        import dataclasses

        import jax
        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        from cloth_splatting_tpu.models import gaussians as G
        from cloth_splatting_tpu.ops.camera import Camera
        from cloth_splatting_tpu.render import CameraArrays, camera_arrays
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.step import Trainer

        fov = 2 * np.arctan(0.4)
        mesh = grid_cloth_mesh(4, 4, size=1.2)
        cfg = Config()
        cfg.opt.raster_backend = "pallas"
        trainer = Trainer(cfg, mesh, jnp.tile(mesh.pos[None], (3, 1, 1)),
                          32, 32, np.tan(fov / 2), np.tan(fov / 2), 2.0)
        rng = np.random.default_rng(0)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                          capacity=128)
        state = trainer.init_state(rng, params, gstate)
        cam = Camera.create(R=np.eye(3), t=np.asarray([0.0, 0.0, 3.0]),
                            fovx=fov, fovy=fov, width=32, height=32, time=0.5)
        arrs = [camera_arrays(dataclasses.replace(cam, time=float(t)))
                for t in (0.0, 1.0)]
        cams = CameraArrays(*[jnp.stack([getattr(a, f) for a in arrs])
                              for f in CameraArrays._fields])
        gts = jnp.full((2, 3, 32, 32), 0.5, jnp.float32)
        new_state, m = trainer.step(state, cams, gts, None, sh_degree=0,
                                    static=True)
        assert np.isfinite(float(m.loss))
        moved = jnp.abs(new_state.params.features_dc
                        - state.params.features_dc).max()
        assert float(moved) > 0.0


class TestTile32:
    """tile_size auto-selection: the 32px serving config must match the 16px
    path bit-for-bit up to fp accumulation order (measured 7e-5 at 800x800)."""

    def test_tile32_matches_tile16(self):
        proj = project_scene(n=200, seed=7)
        rgb16, dep16, acc16, _ = rasterize_pallas(
            proj, W, H, (1.0, 1.0, 1.0), tile_size=16, win=5, interpret=True)
        rgb32, dep32, acc32, _ = rasterize_pallas(
            proj, W, H, (1.0, 1.0, 1.0), tile_size=32, win=3, interpret=True)
        np.testing.assert_allclose(np.asarray(rgb32), np.asarray(rgb16),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(acc32), np.asarray(acc16),
                                   atol=2e-4)

    def test_auto_select_rules(self):
        # small frames stay at 16; the auto path must still be correct
        proj = project_scene(n=64, seed=8)
        rgb_auto, _, _, _ = rasterize_pallas(proj, W, H, (0.0, 0.0, 0.0),
                                             interpret=True)
        rgb_16, _, _, _ = rasterize_pallas(proj, W, H, (0.0, 0.0, 0.0),
                                           tile_size=16, win=5, interpret=True)
        np.testing.assert_allclose(np.asarray(rgb_auto), np.asarray(rgb_16),
                                   atol=1e-6)


class TestDeepOcclusionGrads:
    """Regression for the transmittance-underflow NaN: ~200 stacked
    near-opaque splats drive prod(1 - alpha) below fp32 range inside one
    chunk; the backward's T reconstruction must stay finite and bounded."""

    def test_grads_finite_under_opaque_stack(self):
        import jax
        from cloth_splatting_tpu.ops.projection import ProjectedGaussians
        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            rasterize_pallas_grad,
        )

        n = 200
        rng = np.random.default_rng(0)
        xy = jnp.asarray(
            W / 2 + rng.normal(0, 1.5, size=(n, 2)), jnp.float32)
        depth = jnp.asarray(np.linspace(1.0, 3.0, n), jnp.float32)
        conic = jnp.tile(jnp.asarray([[0.02, 0.0, 0.02]], jnp.float32),
                         (n, 1))
        color = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        opacity = jnp.full((n,), 0.995, jnp.float32)   # near-opaque stack
        proj = ProjectedGaussians(
            xy=xy, depth=depth, conic=conic,
            radius=jnp.full((n,), 20.0, jnp.float32),
            color=color, opacity=opacity,
            valid=jnp.ones((n,), bool),
            power_cut=jnp.full((n,), -50.0, jnp.float32))

        def loss(op, color, xy):
            p = proj._replace(opacity=op, color=color, xy=xy)
            rgb, dep, acc = rasterize_pallas_grad(p, W, H, (1.0, 1.0, 1.0),
                                                  interpret=True)
            return jnp.mean(rgb) + 0.1 * jnp.mean(acc)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            opacity, color, xy)
        assert np.isfinite(float(val))

        def loss_oracle(op, color, xy):
            p = proj._replace(opacity=op, color=color, xy=xy)
            rgb, dep, acc = rasterize_reference(p, W, H, jnp.ones(3))
            return jnp.mean(rgb) + 0.1 * jnp.mean(acc)

        grads_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(
            opacity, color, xy)
        for name, g, go in zip(("opacity", "color", "xy"), grads, grads_o):
            arr, ref = np.asarray(g), np.asarray(go)
            assert np.all(np.isfinite(arr)), f"non-finite grad in {name}"
            # the two-sweep backward must MATCH the oracle here — the old
            # divide-back-up design produced inf/NaN (then, clamped,
            # 1e5x-wrong front-instance gradients)
            scale = np.abs(ref).max() + 1e-12
            np.testing.assert_allclose(arr, ref, atol=5e-4 * scale,
                                       err_msg=name)


class TestMultiGroupBoundaries:
    """The training tier's saved transmittance boundaries are packed 128
    flat-chunk indices per [pixels, 128] HBM group, with a persistent
    scratch flushed at every group edge of the sequential tile walk.
    The small-scene tests above fit a single group; this scene forces
    several groups (and therefore mid-walk flushes and backward group-cache
    reloads), then checks forward + gradients against the dense
    differentiable XLA tier."""

    WG = HG = 192  # 144 tiles at 16px

    def _scene(self, n=4500, seed=11):
        from cloth_splatting_tpu.ops.projection import ProjectedGaussians

        rng = np.random.default_rng(seed)
        xy = jnp.asarray(rng.uniform(4, self.WG - 4, (n, 2)), jnp.float32)
        depth = jnp.asarray(rng.uniform(1.0, 6.0, n), jnp.float32)
        # radii stay under the small-stream span (7.49 px at 16px tiles) so
        # the big-cap support shrink never kicks in and the dense tier is an
        # exact semantic match (modulo the TRANS_EPS early exit)
        inv = 1.0 / rng.uniform(2.0, 6.0, n).astype(np.float32)
        conic = jnp.stack(
            [jnp.asarray(inv), jnp.zeros(n, jnp.float32), jnp.asarray(inv)],
            axis=1)
        return ProjectedGaussians(
            xy=xy, depth=depth, conic=conic,
            radius=jnp.asarray(3.0 / np.sqrt(inv), jnp.float32),
            color=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
            opacity=jnp.asarray(rng.uniform(0.1, 0.8, n), jnp.float32),
            valid=jnp.ones((n,), bool),
            power_cut=jnp.full((n,), -4.5, jnp.float32),
        )

    def test_crosses_groups_and_matches_dense_tier(self):
        import jax

        from cloth_splatting_tpu.ops.rasterize import rasterize_tiled
        from cloth_splatting_tpu.ops.rasterize.pallas_tiled import (
            CHUNK,
            sorted_pack,
        )
        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            chunk_layout,
            rasterize_pallas_grad,
        )

        proj = self._scene()
        w = h = self.WG
        tw = th = w // 16

        packed = sorted_pack(proj, tw, th, 16, 5)
        _, bound = chunk_layout(packed, tw * th)
        assert bound > 2 * CHUNK, (
            f"scene too small to cross boundary groups (bound={bound})")

        tgt = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (3, h, w)), jnp.float32)

        def loss_dense(xy, conic, color, op):
            p = proj._replace(xy=xy, conic=conic, color=color, opacity=op)
            rgb, dep, acc, aux = rasterize_tiled(p, w, h, jnp.ones(3),
                                                 k_cap=512)
            return (jnp.mean((rgb - tgt) ** 2) + 0.05 * jnp.mean(acc),
                    aux.n_dropped)

        def loss_pallas(xy, conic, color, op):
            p = proj._replace(xy=xy, conic=conic, color=color, opacity=op)
            rgb, dep, acc = rasterize_pallas_grad(
                p, w, h, (1.0, 1.0, 1.0), tile_size=16, win=5, interpret=True)
            return jnp.mean((rgb - tgt) ** 2) + 0.05 * jnp.mean(acc)

        args = (proj.xy, proj.conic, proj.color, proj.opacity)
        (l_d, dropped), g_d = jax.value_and_grad(
            loss_dense, argnums=(0, 1, 2, 3), has_aux=True)(*args)
        assert int(dropped) == 0  # fair comparison needs an uncapped dense run
        l_p, g_p = jax.value_and_grad(
            loss_pallas, argnums=(0, 1, 2, 3))(*args)

        np.testing.assert_allclose(float(l_p), float(l_d), rtol=2e-4)
        for name, a, b in zip(("xy", "conic", "color", "op"), g_d, g_p):
            # absolute floor: instances past the TRANS_EPS early exit carry
            # zero grads in the Pallas tier but tiny nonzero ones densely
            scale = float(jnp.abs(a).max()) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=max(5e-4 * scale, 1e-5),
                                       err_msg=name)


class TestSpanPath:
    """Span fast path (one DMA per multi-tile program) must match the
    per-tile chunk walk: same blocks, same order, same math — only the
    fetch strategy differs. Not asserted bitwise: the compositor's C-row /
    monomial arithmetic is inlined at two call sites and the compiler may
    contract mul+add chains (FMA) differently in each, so outputs can
    differ by a few f32 ulps. span_cap=1 forces most programs onto the
    overflow fallback, covering both branches."""

    @pytest.mark.parametrize("tpp,span_cap", [(4, 8), (8, 16), (2, 1)])
    def test_matches_default_walk(self, tpp, span_cap):
        proj = project_scene(n=300, seed=3)
        base = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0), tile_size=16,
                                win=5, interpret=True)
        out = rasterize_pallas(proj, W, H, (1.0, 1.0, 1.0), tile_size=16,
                               win=5, interpret=True,
                               tiles_per_program=tpp, span_cap=span_cap)
        for a, b in zip(base[:3], out[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    @pytest.mark.slow
    def test_span_empty_scene(self):
        proj = project_scene(n=16, seed=4)
        proj = proj._replace(valid=jnp.zeros_like(proj.valid))
        rgb, dep, acc, _ = rasterize_pallas(
            proj, W, H, (0.25, 0.5, 0.75), tile_size=16, win=5,
            interpret=True, tiles_per_program=4, span_cap=4)
        np.testing.assert_allclose(np.asarray(rgb[0]), 0.25, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb[2]), 0.75, atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)


class TestTrainSpanPath:
    """The train-forward span path must leave values bit-identical (same
    chunk math, same transmittance-boundary saves). Gradients agree to fp
    reassociation only: the default (span_cap=None) backward is the
    forward-order rolling-accumulator kernel, whose suffix S_i comes from
    U_tot minus a forward prefix, while the span path keeps the reverse
    sweep's back-to-front carry — algebraically identical, different
    summation order."""

    # (2,1) stays in the fast tier (overflow fallback covered); the wide
    # (4,8) span is the same code path at ~2x the interpret cost -> slow.
    @pytest.mark.parametrize(
        "tpp,span_cap",
        [pytest.param(4, 8, marks=pytest.mark.slow), (2, 1)])
    def test_value_and_grads_identical(self, tpp, span_cap):
        import jax
        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            rasterize_pallas_grad,
        )

        proj = project_scene(n=250, seed=6)

        def make_loss(t, c):
            def f(xy, conic, color, op):
                p = proj._replace(xy=xy, conic=conic, color=color, opacity=op)
                rgb, dep, acc = rasterize_pallas_grad(
                    p, W, H, (1.0, 1.0, 1.0), tile_size=16, win=5,
                    interpret=True, tiles_per_program=t, span_cap=c)
                return rgb.mean() + 0.3 * dep.mean() + 0.1 * acc.mean()
            return f

        args = (proj.xy, proj.conic, proj.color, proj.opacity)
        v0, g0 = jax.value_and_grad(make_loss(None, None),
                                    argnums=(0, 1, 2, 3))(*args)
        v1, g1 = jax.value_and_grad(make_loss(tpp, span_cap),
                                    argnums=(0, 1, 2, 3))(*args)
        # values/grads agree to fp reassociation only: the span and default
        # kernels inline the compositor/chunk_grads matmuls at different
        # call sites, so FMA contraction / 6-pass-HIGHEST rounding differ by
        # a few ulps on top of the documented summation-order difference
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        for a, b in zip(g0, g1):
            scale = float(jnp.abs(a).max()) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4 * scale)

    @pytest.mark.slow
    @pytest.mark.parametrize("tpp,span_cap", [(4, 8)])
    def test_backward_span_shared_chunk_accumulation(self, tpp, span_cap):
        """Dense overlapping scene: many tiles share boundary chunks, so the
        span path's VMEM accumulation must reproduce the HBM
        read-modify-write exactly."""
        import jax
        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            rasterize_pallas_grad,
        )

        proj = project_scene(n=600, seed=9)

        def make_loss(t, c):
            def f(xy, color, op):
                p = proj._replace(xy=xy, color=color, opacity=op)
                rgb, dep, acc = rasterize_pallas_grad(
                    p, W, H, (0.0, 0.0, 0.0), tile_size=16, win=5,
                    interpret=True, tiles_per_program=t, span_cap=c)
                return (rgb * rgb).mean() + dep.mean()
            return f

        args = (proj.xy, proj.color, proj.opacity)
        _, g0 = jax.value_and_grad(make_loss(None, None),
                                   argnums=(0, 1, 2))(*args)
        _, g1 = jax.value_and_grad(make_loss(tpp, span_cap),
                                   argnums=(0, 1, 2))(*args)
        for a, b in zip(g0, g1):
            scale = float(jnp.abs(a).max()) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5 * scale)
