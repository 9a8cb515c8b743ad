"""End-to-end splat training tests on a synthetic cloth scene
(SURVEY.md section 4 layer 4): our own renderer supplies the ground truth."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.models.deform import init_residual_simulator
from cloth_splatting_tpu.ops.camera import Camera
from cloth_splatting_tpu.ops.image import inverse_sigmoid
from cloth_splatting_tpu.render import CameraArrays, camera_arrays, render
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.step import Trainer

W = H = 64
FOV = 2 * np.arctan(0.4)


def look_at_cameras(n=3, radius=3.0, time=0.0):
    """Cameras on a small arc looking at the origin from -z."""
    cams = []
    for i in range(n):
        ang = (i - (n - 1) / 2) * 0.3
        # camera-to-world: camera at (sin a * r, 0, -cos a * r) looking at origin
        fwd = np.asarray([-np.sin(ang), 0.0, np.cos(ang)])
        up = np.asarray([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w_rot = np.stack([right, up2, fwd], axis=1)   # columns
        cam_pos = -fwd * radius
        # world->cam: R_w2c = c2w_rot.T, t = -R_w2c @ cam_pos
        r_w2c = c2w_rot.T
        t = -r_w2c @ cam_pos
        # loader convention: R stored transposed (camera.py world_to_view does R.T)
        cams.append(Camera.create(R=r_w2c.T, t=t, fovx=FOV, fovy=FOV,
                                  width=W, height=H, time=time))
    return cams


def stack_cams(cams):
    arrs = [camera_arrays(c) for c in cams]
    return CameraArrays(*[jnp.stack([getattr(a, f) for a in arrs]) for f in CameraArrays._fields])


def make_cfg():
    cfg = Config()
    cfg.opt.raster_k_cap = 128
    cfg.opt.raster_k_chunk = 16
    cfg.opt.densify_from_iter = 10
    cfg.opt.densification_interval = 25
    cfg.opt.pruning_from_iter = 10
    cfg.opt.pruning_interval = 25
    cfg.opt.densify_until_iter = 1000
    cfg.opt.opacity_reset_interval = 10_000
    cfg.opt.densify_grad_threshold_fine_init = 1e-4
    cfg.opt.densify_grad_threshold_after = 1e-4
    return cfg


def make_target_scene(mesh, cfg, seed=42):
    """A 'ground truth' Gaussian field: patterned colors, solid opacity."""
    rng = np.random.default_rng(seed)
    params, state = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
    xyz = G.gaussian_positions(params, state, mesh)
    colors = jnp.stack([
        0.5 + 0.5 * jnp.sin(7 * xyz[:, 0]),
        0.5 + 0.5 * jnp.cos(9 * xyz[:, 1]),
        jnp.full_like(xyz[:, 0], 0.4),
    ], axis=1)
    from cloth_splatting_tpu.ops.sh import rgb_to_sh
    params = params._replace(
        features_dc=rgb_to_sh(colors)[:, None, :],
        opacity=jnp.full_like(params.opacity, inverse_sigmoid(jnp.asarray(0.9))),
        scaling=params.scaling + 0.3,
    )
    return params, state


def render_gt(cams, params, state, mesh, cfg, sim_params=None, preds=None):
    outs = []
    for c in cams:
        out = render(camera_arrays(c), W, H, np.tan(FOV / 2), np.tan(FOV / 2),
                     params, state, mesh, sim_params, preds,
                     jnp.ones(3), cfg.model.sh_degree,
                     render_static=sim_params is None, k_cap=128, k_chunk=16)
        outs.append(out.rgb)
    return jnp.stack(outs)


@pytest.fixture(scope="module")
def scene():
    mesh = grid_cloth_mesh(8, 8, size=1.4)
    cfg = make_cfg()
    gt_params, gt_state = make_target_scene(mesh, cfg)
    cams = look_at_cameras(3)
    gt_images = render_gt(cams, gt_params, gt_state, mesh, cfg)
    return mesh, cfg, cams, gt_images


class TestStaticFit:
    def test_static_overfit_improves_psnr(self, scene):
        mesh, cfg, cams, gt_images = scene
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2),
                          spatial_lr_scale=3.0)
        rng = np.random.default_rng(0)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        cam_batch = stack_cams(cams)

        psnr_first = None
        key = jax.random.PRNGKey(0)
        for it in range(1, 201):
            state, metrics = trainer.step(state, cam_batch, gt_images, None,
                                          sh_degree=0, static=True)
            if psnr_first is None:
                psnr_first = float(metrics.psnr)
        psnr_last = float(metrics.psnr)
        assert np.isfinite(psnr_last)
        assert psnr_last > psnr_first + 4.0, (psnr_first, psnr_last)
        assert psnr_last > 15.5, psnr_last

    def test_density_control_cycle(self, scene):
        mesh, cfg, cams, gt_images = scene
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2),
                          spatial_lr_scale=3.0)
        rng = np.random.default_rng(1)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        cam_batch = stack_cams(cams)
        n0 = int(G.num_alive(state.gstate))

        key = jax.random.PRNGKey(1)
        grew = False
        capacity_grew = False
        for it in range(1, 80):
            state, metrics = trainer.step(state, cam_batch, gt_images, None,
                                          sh_degree=0, static=True)
            key, sub = jax.random.split(key)
            cap_before = state.params.face_bary.shape[0]
            state, overflow = trainer.density_control(state, it, sub)
            cap_after = state.params.face_bary.shape[0]
            if overflow > 0:
                # overflow must trigger capacity growth (train/step.py
                # grow_capacity), never silent truncation
                assert cap_after > cap_before, (overflow, cap_before, cap_after)
                capacity_grew = True
            n = int(G.num_alive(state.gstate))
            if n > n0:
                grew = True
        assert grew, "densification never added gaussians"
        # alive never exceeds the (possibly grown) capacity
        cap = state.params.face_bary.shape[0]
        assert int(G.num_alive(state.gstate)) <= cap
        # with the aggressive 1e-4 threshold the 196-gaussian init should
        # overflow 512 within 3 densify rounds and grow capacity
        assert capacity_grew and cap > 512

    def test_opacity_reset(self, scene):
        mesh, cfg, cams, _ = scene
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(2)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        state = trainer._reset_opacity(state)
        assert float(jnp.max(G.get_opacity(state.params))) <= 0.0101


class TestLrTailDecay:
    def test_tail_multiplies_all_groups(self, scene):
        mesh, _, _, _ = scene
        cfg = make_cfg()
        cfg.opt.iterations = 1000
        cfg.opt.lr_tail_start = 0.5
        cfg.opt.lr_tail_floor = 0.01
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2),
                          np.tan(FOV / 2), spatial_lr_scale=3.0)
        lr_mid = trainer._lr_tree(500)    # tail just starting: full LR
        lr_end = trainer._lr_tree(1000)   # tail done: floor * LR
        for f in ("opacity", "scaling", "rotation", "features_dc"):
            a = float(jnp.asarray(getattr(lr_mid, f)))
            b = float(jnp.asarray(getattr(lr_end, f)))
            assert b == pytest.approx(0.01 * a, rel=1e-4), (f, a, b)
        # disabled by default: multiplier 1 exactly
        assert trainer._tail_mult(10_000) == 1.0 or cfg.opt.lr_tail_start < 1.0

    def test_default_off_matches_reference(self, scene):
        mesh, cfg, _, _ = scene
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2),
                          np.tan(FOV / 2), spatial_lr_scale=3.0)
        lr = trainer._lr_tree(cfg.opt.iterations)
        assert float(jnp.asarray(lr.opacity)) == pytest.approx(cfg.opt.opacity_lr)


class TestDynamicFit:
    def test_dynamic_fit_runs_and_learns(self, scene):
        mesh, cfg, cams0, _ = scene
        # mesh predictions: cloth translating along +y over 3 timesteps
        shift = jnp.asarray([0.0, 0.25, 0.0])
        preds = jnp.stack([mesh.pos + t * shift for t in range(3)])
        gt_params, gt_state = make_target_scene(mesh, cfg, seed=7)
        sim_gt = init_residual_simulator(np.random.default_rng(3), int(mesh.pos.shape[0]))

        times = [0.0, 0.5, 1.0]
        cams = [look_at_cameras(1, time=t)[0] for t in times]
        gt_images = jnp.concatenate([
            render_gt([c], gt_params, gt_state, mesh, cfg, sim_params=sim_gt, preds=preds)
            for c in cams
        ])

        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(4)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        cam_batch = stack_cams(cams)

        losses = []
        for it in range(60):
            state, metrics = trainer.step(state, cam_batch, gt_images, None,
                                          sh_degree=0, static=False)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    def test_simulator_gradient_flow(self, scene):
        """Simulator params must change during dynamic training."""
        mesh, cfg, cams, gt_images = scene
        preds = jnp.stack([mesh.pos + 0.05 * t for t in range(3)])
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(5)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        cam_batch = stack_cams(cams)
        w_before = np.asarray(state.sim_params.w_out).copy()
        state, _ = trainer.step(state, cam_batch, gt_images, None,
                                sh_degree=0, static=False)
        assert not np.allclose(np.asarray(state.sim_params.w_out), w_before)

    def test_static_freezes_simulator(self, scene):
        mesh, cfg, cams, gt_images = scene
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(6)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        cam_batch = stack_cams(cams)
        w_before = np.asarray(state.sim_params.w_out).copy()
        state, _ = trainer.step(state, cam_batch, gt_images, None,
                                sh_degree=0, static=True)
        np.testing.assert_array_equal(np.asarray(state.sim_params.w_out), w_before)


class TestEmbeddingSimulatorTraining:
    """--simulator embedding end-to-end (reference
    ResidualMeshSimulatorEmbedding, meshnet_network.py:382-411): init via
    cfg, gradient flow into the per-time table, checkpoint roundtrip."""

    def test_embedding_trains_and_roundtrips(self, scene, tmp_path):
        from cloth_splatting_tpu.eval.render_sets import load_trained_model
        from cloth_splatting_tpu.models.deform import EmbeddingSimulatorParams
        from cloth_splatting_tpu.train.loop import save_scene_checkpoint

        mesh, cfg_base, cams, gt_images = scene
        cfg = dataclasses.replace(
            cfg_base, model=dataclasses.replace(cfg_base.model,
                                                simulator="embedding"))
        preds = jnp.stack([mesh.pos + 0.05 * t for t in range(3)])
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2),
                          np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(11)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                          capacity=512)
        state = trainer.init_state(rng, params, gstate)
        assert isinstance(state.sim_params, EmbeddingSimulatorParams)
        assert state.sim_params.embedding.shape == (3, mesh.pos.shape[0] * 3)

        cam_batch = stack_cams(cams)
        emb_before = np.asarray(state.sim_params.embedding).copy()
        losses = []
        for _ in range(20):
            state, metrics = trainer.step(state, cam_batch, gt_images, None,
                                          sh_degree=0, static=False)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses[-1])
        assert not np.allclose(np.asarray(state.sim_params.embedding),
                               emb_before)

        out = str(tmp_path / "emb_exp")
        save_scene_checkpoint(out, 20, trainer, jax.device_get(state))
        _, _, _, sim_restored, it = load_trained_model(out, None)
        assert it == 20
        assert isinstance(sim_restored, EmbeddingSimulatorParams)
        np.testing.assert_allclose(np.asarray(sim_restored.embedding),
                                   np.asarray(state.sim_params.embedding),
                                   atol=0)

    def test_static_freezes_embedding(self, scene):
        mesh, cfg_base, cams, gt_images = scene
        cfg = dataclasses.replace(
            cfg_base, model=dataclasses.replace(cfg_base.model,
                                                simulator="embedding"))
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2),
                          np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(12)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                          capacity=512)
        state = trainer.init_state(rng, params, gstate)
        emb_before = np.asarray(state.sim_params.embedding).copy()
        state, _ = trainer.step(state, stack_cams(cams), gt_images, None,
                                sh_degree=0, static=True)
        np.testing.assert_array_equal(np.asarray(state.sim_params.embedding),
                                      emb_before)


class TestBaryCleanup:
    def test_negative_bary_reassigned(self, scene):
        mesh, cfg, _, _ = scene
        rng = np.random.default_rng(8)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        bary = np.asarray(params.face_bary).copy()
        bary[0] = [-0.2, 0.6, 0.6]
        params = params._replace(face_bary=jnp.asarray(bary))
        from cloth_splatting_tpu.train.step import cleanup_barycentric_host
        new_params, new_state = cleanup_barycentric_host(params, gstate, mesh)
        nb = np.asarray(new_params.face_bary)
        assert (nb[0] >= 0).all()


class TestCapacityGrowth:
    def test_grow_capacity_preserves_and_extends(self, scene):
        mesh, cfg, cams, gt_images = scene
        preds = jnp.tile(mesh.pos[None], (3, 1, 1))
        trainer = Trainer(cfg, mesh, preds, W, H, np.tan(FOV / 2), np.tan(FOV / 2), 3.0)
        rng = np.random.default_rng(9)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2, capacity=512)
        state = trainer.init_state(rng, params, gstate)
        cam_batch = stack_cams(cams)
        state, _ = trainer.step(state, cam_batch, gt_images, None,
                                sh_degree=0, static=True)
        n0 = int(G.num_alive(state.gstate))
        bary0 = np.asarray(state.params.face_bary)

        grown = trainer.grow_capacity(state)
        assert grown.params.face_bary.shape[0] == 1024
        assert int(G.num_alive(grown.gstate)) == n0
        np.testing.assert_array_equal(np.asarray(grown.params.face_bary)[:512], bary0)
        # training continues at the new capacity
        grown, metrics = trainer.step(grown, cam_batch, gt_images, None,
                                      sh_degree=0, static=True)
        assert np.isfinite(float(metrics.loss))


class TestSingleCameraRegime:
    """three_steps_batch=False: the reference's FourDGSdataset path (one
    random camera per dynamic iteration, scene.py:131-137)."""

    def test_single_camera_batches_train(self, tmp_path):
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.loop import train_scene

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=3, n_times=3,
                                 image_size=32, mesh_res=6)
        scene = load_cloth_scene(scene_dir)
        cfg = Config()
        cfg.model.source_path = scene_dir
        cfg.model.model_path = str(tmp_path / "out")
        cfg.opt.iterations = 12
        cfg.opt.static_reconst_iteration = 4
        cfg.opt.raster_k_cap = 64
        cfg.opt.raster_k_chunk = 16
        seen_batches = []
        state = train_scene(cfg, scene, cfg.model.model_path,
                            progress_every=100, three_steps_batch=False,
                            on_iteration=lambda it, m: seen_batches.append(m))
        assert len(seen_batches) == 12
        assert all(np.isfinite(m["loss"]) for m in seen_batches)


class TestParamEMA:
    """config.param_ema > 0: evals and saved PLYs use the Polyak average of
    (gaussian, simulator) params — the anti-jitter capability motivated by
    the r4 truth probes (a from-exact-GT fit wanders a 44-49 dB band under
    constant-LR Adam)."""

    def test_saved_checkpoint_is_averaged(self, tmp_path):
        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.loop import train_scene

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=3, n_times=3,
                                 image_size=32, mesh_res=6)
        scene = load_cloth_scene(scene_dir)

        def run(out, ema):
            cfg = Config()
            cfg.model.source_path = scene_dir
            cfg.model.model_path = out
            cfg.opt.iterations = 14
            cfg.opt.static_reconst_iteration = 4
            cfg.opt.raster_k_cap = 64
            cfg.opt.raster_k_chunk = 16
            cfg.opt.param_ema = ema
            return train_scene(cfg, scene, out, save_iterations=(14,),
                               progress_every=100, seed=3)

        st_raw = run(str(tmp_path / "raw"), 0.0)
        st_ema = run(str(tmp_path / "ema"), 0.9)
        # identical RNG streams -> identical final raw iterates
        np.testing.assert_array_equal(np.asarray(st_raw.params.opacity),
                                      np.asarray(st_ema.params.opacity))
        import os

        from cloth_splatting_tpu.data.ply_io import read_ply

        def load_op(out):
            path = os.path.join(out, "point_cloud", "iteration_14",
                                "point_cloud.ply")
            return read_ply(path)["opacity"]

        op_raw, op_ema = load_op(str(tmp_path / "raw")), load_op(str(tmp_path / "ema"))
        # the EMA'd save differs from the raw save but stays in range
        assert not np.allclose(op_raw, op_ema)
        assert np.isfinite(op_ema).all()


@pytest.mark.slow
class TestKCapAutoGrow:
    """Persistent dense-tier k_cap overflow must auto-double the cap and
    keep training (the CUDA tier has no cap at all; report-only warnings
    let overflow pass once the log scrolls by). Slow: every growth re-jits
    the banked step."""

    def test_overflow_grows_cap_and_converges(self, tmp_path, capsys):
        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.loop import train_scene

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=3, n_times=3,
                                 image_size=32, mesh_res=8)
        scene = load_cloth_scene(scene_dir)
        cfg = Config()
        cfg.model.source_path = scene_dir
        cfg.model.model_path = str(tmp_path / "out")
        cfg.opt.iterations = 20
        cfg.opt.static_reconst_iteration = 25    # stay in the static stage
        cfg.opt.raster_backend = "tiled"
        # 8x8-res mesh -> 256 alive Gaussians over a 2x2 tile grid: a cap
        # of 4 overflows massively on every step
        cfg.opt.raster_k_cap = 4
        cfg.opt.raster_k_chunk = 4
        losses = []
        train_scene(cfg, scene, cfg.model.model_path, progress_every=4,
                    on_iteration=lambda it, m: losses.append(m["loss"]))
        out = capsys.readouterr().out
        assert "growing raster_k_cap" in out
        assert cfg.opt.raster_k_cap > 4          # doubled at least once
        assert all(np.isfinite(l) for l in losses)

    def test_in_loop_eval_grows_cap_until_exact(self, tmp_path):
        """evaluate_split (the training_report path) must score exactly
        like metrics.py: with a truncating train k_cap it grows its own
        eval cap until n_dropped == 0 instead of under-reporting PSNR."""
        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import (
            generate_synthetic_scene,
            target_gaussians,
        )
        from cloth_splatting_tpu.models.deform import init_residual_simulator
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.loop import evaluate_split

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=3, n_times=2,
                                 image_size=32, mesh_res=8)
        scene = load_cloth_scene(scene_dir)
        mesh = scene.initial_mesh
        params, gstate = target_gaussians(mesh, sh_degree=0, seed=0)
        sim = init_residual_simulator(np.random.default_rng(0),
                                      int(mesh.pos.shape[0]))
        cam0 = scene.train.get(0, 0).camera

        def run(k_cap, backend="tiled"):
            cfg = Config()
            cfg.opt.raster_backend = backend
            cfg.opt.raster_k_cap = k_cap
            cfg.opt.raster_k_chunk = min(16, k_cap)
            trainer = Trainer(cfg, mesh, jnp.asarray(scene.mesh_predictions),
                              cam0.width, cam0.height, cam0.tanfovx,
                              cam0.tanfovy, 2.0)
            state = trainer.init_state(np.random.default_rng(0), params,
                                       gstate, sim)
            return evaluate_split(trainer, state, scene.train, True, 0)

        # the target field (256 gaussians on a 2x2 tile grid) overflows
        # k_cap=4 massively; the growth loop must recover the exact score
        exact = run(512)
        grown = run(4)
        np.testing.assert_allclose(grown["psnr"], exact["psnr"], rtol=1e-4)
        # the TPU train backend: pallas is capless — eval must run it
        # (bg_static threading) and score the scene at the same fidelity
        # class (the tiers intentionally diverge in far-tail cutoffs /
        # depth keys, see ARCHITECTURE 'Known divergences': at ~50+ dB on
        # this trivial scene that's a few dB of spread, not truncation)
        pallas = run(512, backend="pallas")
        assert pallas["psnr"] > 45.0, pallas

    def test_eval_grows_cap_until_exact(self, tmp_path, capsys):
        """render_set must not score a checkpoint through a truncating
        k_cap: it doubles until n_dropped == 0 (a dense 128px checkpoint
        once lost ~9 dB to silent eval truncation)."""
        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.eval.render_sets import render_set
        from cloth_splatting_tpu.models.deform import init_residual_simulator

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=2, n_times=2,
                                 image_size=32, mesh_res=8)
        scene = load_cloth_scene(scene_dir, eval_split=False)
        mesh = scene.initial_mesh
        from cloth_splatting_tpu.data.synthetic import target_gaussians
        params, state = target_gaussians(mesh, sh_degree=0, seed=0)
        sim = init_residual_simulator(np.random.default_rng(0),
                                      int(mesh.pos.shape[0]))
        cams = [scene.train.get(v, 0).camera for v in range(scene.train.n_views)]
        res = render_set(str(tmp_path / "out"), "test", 1, cams, [],
                         params, state, mesh, sim,
                         jnp.asarray(scene.mesh_predictions), True,
                         sh_degree=0, k_cap=4)
        out = capsys.readouterr().out
        assert "growing eval k_cap" in out
        assert np.isfinite(res["fps"])
