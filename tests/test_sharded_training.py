"""Multi-chip TRAINING tests: the user-reachable sharded mode (VERDICT r2
item 3) — the banked shard_map step with masks/kNN/EMA-carry, the
ShardedTrainer host schedule (density control, capacity growth, bary
cleanup) on sharded state, and train_scene(device_mesh=...) end-to-end.

The fast-tier smoke runs on a 2-device mesh so the commit gate exercises
the collective path (VERDICT r2 item 5); the full 8-device equivalence
runs in the slow tier alongside tests/test_parallel.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.models.deform import init_residual_simulator
from cloth_splatting_tpu.ops.camera import Camera
from cloth_splatting_tpu.parallel.mesh import make_mesh
from cloth_splatting_tpu.parallel.trainer import ShardedTrainer
from cloth_splatting_tpu.render import CameraArrays, camera_arrays
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.step import StepCarry, Trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs >=2 (virtual) devices")


def _scene(capacity=512, image_size=32, mesh_res=5):
    rng = np.random.default_rng(0)
    mesh = grid_cloth_mesh(mesh_res, mesh_res, size=1.2)
    cfg = Config()
    cfg.opt.raster_k_cap = 64
    cfg.opt.raster_k_chunk = 16
    params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                      capacity=capacity)
    sim_params = init_residual_simulator(rng, int(mesh.pos.shape[0]))
    preds = jnp.tile(mesh.pos[None], (3, 1, 1))
    fov = 2 * np.arctan(0.4)
    cam = Camera.create(R=np.eye(3), t=np.asarray([0.0, 0.0, 3.0]),
                        fovx=fov, fovy=fov, width=image_size,
                        height=image_size, time=0.5)
    return cfg, mesh, params, gstate, sim_params, preds, cam


def _banks(cam, n_views=2, n_times=3, seed=3):
    """(view x time) camera/GT banks like train/loop.py build_banks."""
    rng = np.random.default_rng(seed)
    rows = []
    for v in range(n_views):
        arrs = [camera_arrays(dataclasses.replace(cam, time=t))
                for t in np.linspace(0, 1, n_times)]
        rows.append(CameraArrays(*[jnp.stack([getattr(a, f) for a in arrs])
                                   for f in CameraArrays._fields]))
    cam_bank = CameraArrays(*[jnp.stack([getattr(r, f) for r in rows])
                              for f in CameraArrays._fields])
    gt_bank = jnp.asarray(rng.integers(
        0, 255, (n_views, n_times, 3, cam.height, cam.width)), jnp.uint8)
    mask = np.ones((n_views, n_times, 1, cam.height, cam.width), np.float32)
    mask[..., : cam.height // 2, :] = 0.0
    return cam_bank, gt_bank, jnp.asarray(mask)


def _make(cfg, mesh, preds, cam, params, gstate, sim_params, dmesh):
    trainer = Trainer(cfg, mesh, preds, cam.width, cam.height,
                      cam.tanfovx, cam.tanfovy, spatial_lr_scale=2.0)
    state = trainer.init_state(np.random.default_rng(0), params, gstate,
                               sim_params)
    driver = ShardedTrainer(trainer, dmesh)
    return trainer, driver, state


class TestBankedShardedStepSmoke:
    """Fast-tier 2-device smoke: the commit gate touches the collective
    path on every run (camera-batch pad 3->4 over data=2 included)."""

    def test_matches_unsharded_with_masks(self):
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene()
        dmesh = make_mesh(2)
        trainer, driver, state0 = _make(cfg, mesh, preds, cam, params,
                                        gstate, sim_params, dmesh)
        cam_bank, gt_bank, mask_bank = _banks(cam)

        ref_state, ref_metrics, ref_carry = trainer.step_banked(
            state0, cam_bank, gt_bank, mask_bank, 1, [0, 1, 2],
            sh_degree=1, static=False, carry=StepCarry.zeros())

        sstate = driver.place_state(state0)
        new_state, metrics, carry = driver.step_banked(
            sstate, driver.replicate(cam_bank), driver.replicate(gt_bank),
            driver.replicate(mask_bank), 1, [0, 1, 2],
            sh_degree=1, static=False, carry=StepCarry.zeros())

        np.testing.assert_allclose(float(metrics.loss),
                                   float(ref_metrics.loss), rtol=1e-4)
        np.testing.assert_allclose(float(metrics.psnr),
                                   float(ref_metrics.psnr), rtol=1e-4)
        np.testing.assert_allclose(float(carry.ema_loss),
                                   float(ref_carry.ema_loss), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state.params.face_bary),
                                   np.asarray(ref_state.params.face_bary),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(new_state.gstate.grad_accum),
                                   np.asarray(ref_state.gstate.grad_accum),
                                   rtol=1e-3, atol=1e-7)

    @pytest.mark.slow
    def test_static_stage_single_camera(self):
        """Static stage batch B=1 padded to the data-axis size."""
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene()
        dmesh = make_mesh(2)
        trainer, driver, state0 = _make(cfg, mesh, preds, cam, params,
                                        gstate, sim_params, dmesh)
        cam_bank, gt_bank, _ = _banks(cam)

        _, ref_metrics = trainer.step_banked(
            state0, cam_bank, gt_bank, None, 0, [0],
            sh_degree=0, static=True)
        sstate = driver.place_state(state0)
        _, metrics, _ = driver.step_banked(
            sstate, driver.replicate(cam_bank), driver.replicate(gt_bank),
            None, 0, [0], sh_degree=0, static=True)
        np.testing.assert_allclose(float(metrics.loss),
                                   float(ref_metrics.loss), rtol=1e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestBankedShardedStep8Dev:
    def test_knn_regularizers_match(self):
        """Capacity-global kNN terms under the (2,4) mesh == unsharded
        (VERDICT r2 item 4: support, not fail-fast)."""
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene()
        cfg.opt.lambda_isometric = 0.05
        cfg.opt.lambda_spring = 0.02
        cfg.opt.lambda_rigidity = 0.01
        dmesh = make_mesh(8)
        trainer, driver, state0 = _make(cfg, mesh, preds, cam, params,
                                        gstate, sim_params, dmesh)
        cam_bank, gt_bank, _ = _banks(cam)
        knn = trainer.compute_knn_state(state0)

        ref_state, ref_metrics = trainer.step_banked(
            state0, cam_bank, gt_bank, None, 0, [0, 1, 2],
            sh_degree=1, static=False, knn_state=knn)

        sstate = driver.place_state(state0)
        sknn = driver.compute_knn_state(sstate)
        # neighbor tables can legitimately differ under sharding: the toy
        # scene's Gaussians sit near-coincident (bary ~ 1/3 pairs), so top-k
        # tie-breaking depends on reduction order. The sharded table must be
        # structurally sound: same number of valid neighborhood entries, and
        # finite rest-distances wherever valid.
        assert int(np.sum(np.asarray(sknn.valid))) == int(
            np.sum(np.asarray(knn.valid)))
        svalid = np.asarray(sknn.valid)
        assert np.isfinite(np.asarray(sknn.d0)[svalid]).all()
        # numerics comparison uses the same neighborhoods on both sides
        new_state, metrics, _ = driver.step_banked(
            sstate, driver.replicate(cam_bank), driver.replicate(gt_bank),
            None, 0, [0, 1, 2], sh_degree=1, static=False,
            knn_state=driver.replicate(knn))

        np.testing.assert_allclose(float(metrics.loss),
                                   float(ref_metrics.loss), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state.params.face_bary),
                                   np.asarray(ref_state.params.face_bary),
                                   atol=5e-5)

    def test_density_control_and_cleanup_on_sharded_state(self):
        """densify/prune/reset + capacity growth + bary cleanup run on the
        sharded state and preserve the canonical layout."""
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene(
            capacity=512)
        cfg.opt.densify_from_iter = 0
        cfg.opt.densification_interval = 1
        cfg.opt.pruning_from_iter = 0
        cfg.opt.pruning_interval = 1
        cfg.opt.densify_until_iter = 100
        cfg.opt.densify_grad_threshold_fine_init = 1e-12
        cfg.opt.densify_grad_threshold_after = 1e-12
        dmesh = make_mesh(8)
        trainer, driver, state0 = _make(cfg, mesh, preds, cam, params,
                                        gstate, sim_params, dmesh)
        cam_bank, gt_bank, _ = _banks(cam)
        state = driver.place_state(state0)
        n0 = int(G.num_alive(jax.device_get(state).gstate))
        state, metrics, _ = driver.step_banked(
            state, driver.replicate(cam_bank), driver.replicate(gt_bank),
            None, 0, [0, 1, 2], sh_degree=1, static=False,
            carry=StepCarry.zeros())
        key = jax.random.PRNGKey(0)
        state, _ = driver.density_control(state, 1, key)
        n1 = int(G.num_alive(jax.device_get(state).gstate))
        assert n1 > n0  # the 1e-12 threshold clones/splits everything alive
        # canonical layout survives (next step compiles at the same or a
        # grown capacity, both handled by the cache key)
        state = driver.cleanup_barycentric(state)
        state, metrics, _ = driver.step_banked(
            state, driver.replicate(cam_bank), driver.replicate(gt_bank),
            None, 1, [0, 1, 2], sh_degree=1, static=False,
            carry=StepCarry.zeros())
        assert np.isfinite(float(metrics.loss))
        assert int(metrics.n_alive) == n1

    def test_capacity_rounding_for_model_axis(self):
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene()
        dmesh = make_mesh(8)           # model axis = 4
        trainer, driver, _ = _make(cfg, mesh, preds, cam, params, gstate,
                                   sim_params, dmesh)
        assert driver._mesh_capacity(513) % 4 == 0
        assert driver._mesh_capacity(513) >= 513

    def test_static_b1_pad_exceeds_batch(self):
        """pad > n_cams: the B=1 static stage on a data=4 axis pads 1 -> 4
        by modular repeat (the old a[:pad] concat under-padded and crashed
        the shard_map split)."""
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene()
        dmesh = make_mesh(8, data=4)   # (4, 2): pad = 3 > n_cams = 1
        trainer, driver, state0 = _make(cfg, mesh, preds, cam, params,
                                        gstate, sim_params, dmesh)
        cam_bank, gt_bank, _ = _banks(cam)
        _, ref_metrics = trainer.step_banked(
            state0, cam_bank, gt_bank, None, 0, [0],
            sh_degree=0, static=True)
        sstate = driver.place_state(state0)
        _, metrics, _ = driver.step_banked(
            sstate, driver.replicate(cam_bank), driver.replicate(gt_bank),
            None, 0, [0], sh_degree=0, static=True)
        np.testing.assert_allclose(float(metrics.loss),
                                   float(ref_metrics.loss), rtol=1e-4)

    def test_n_dropped_matches_unsharded(self):
        """Overflow accounting: a tiny k_cap forces tile-instance drops;
        the sharded count must equal the unsharded count (no pad-row or
        model-column inflation)."""
        cfg, mesh, params, gstate, sim_params, preds, cam = _scene()
        cfg.opt.raster_k_cap = 8
        cfg.opt.raster_k_chunk = 8
        dmesh = make_mesh(8)
        trainer, driver, state0 = _make(cfg, mesh, preds, cam, params,
                                        gstate, sim_params, dmesh)
        cam_bank, gt_bank, _ = _banks(cam)
        _, ref_metrics = trainer.step_banked(
            state0, cam_bank, gt_bank, None, 0, [0, 1, 2],
            sh_degree=1, static=False)
        sstate = driver.place_state(state0)
        _, metrics, _ = driver.step_banked(
            sstate, driver.replicate(cam_bank), driver.replicate(gt_bank),
            None, 0, [0, 1, 2], sh_degree=1, static=False)
        ref_dropped = int(ref_metrics.n_dropped)
        assert ref_dropped > 0, "k_cap=8 should overflow on this scene"
        assert int(metrics.n_dropped) == ref_dropped


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestTrainSceneMultichip:
    """train_scene(device_mesh=...) end-to-end THROUGH a densify event,
    against the single-device run (VERDICT r2 item 3 'done' criterion)."""

    def test_matches_single_device_through_densify(self, tmp_path):
        import os

        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.train.loop import train_scene

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=3, n_times=3,
                                 image_size=32, mesh_res=4,
                                 prediction_noise=0.0)
        scene = load_cloth_scene(scene_dir)

        def run(out, device_mesh):
            cfg = Config()
            cfg.model.white_background = True
            cfg.opt.iterations = 50
            cfg.opt.static_reconst = True
            cfg.opt.static_reconst_iteration = 20
            cfg.opt.densify_from_iter = 10
            cfg.opt.densification_interval = 25
            cfg.opt.pruning_from_iter = 10
            cfg.opt.pruning_interval = 25
            cfg.opt.densify_until_iter = 50
            cfg.opt.opacity_reset_interval = 10_000
            cfg.opt.bary_cleanup = 30
            cfg.opt.raster_k_cap = 128
            cfg.opt.raster_k_chunk = 16
            return train_scene(cfg, scene, out, save_iterations=(50,),
                               checkpoint_iterations=(50,),
                               progress_every=1000, seed=7,
                               device_mesh=device_mesh)

        ref = run(str(tmp_path / "single"), None)
        sh = run(str(tmp_path / "sharded"), make_mesh(8))

        ref_alive = int(np.sum(np.asarray(ref.gstate.alive)))
        sh_alive = int(np.sum(np.asarray(sh.gstate.alive)))
        # same host schedule + rng seed; float-accumulation drift can flip a
        # few near-threshold densify/prune decisions, which then PERMUTES
        # slot assignment — so compare populations, not slots
        assert ref_alive > 0
        assert abs(sh_alive - ref_alive) <= max(4, int(0.05 * ref_alive))
        # state equivalence up to slot permutation: both states must render
        # (very nearly) the same image
        from cloth_splatting_tpu.data.scene import load_cloth_scene as _load
        from cloth_splatting_tpu.ops.image import psnr as psnr_fn
        from cloth_splatting_tpu.render import camera_arrays, render
        from cloth_splatting_tpu.train.step import Trainer as _Trainer

        rec = scene.train.get(0, 0)
        cam = rec.camera

        def render_state(st):
            st = jax.device_get(st)
            out = render(
                camera_arrays(cam), cam.width, cam.height, cam.tanfovx,
                cam.tanfovy, st.params, st.gstate, scene.initial_mesh,
                st.sim_params, jnp.asarray(scene.mesh_predictions),
                jnp.ones((3,), jnp.float32), 1, k_cap=128, k_chunk=16)
            return np.asarray(jnp.clip(out.rgb, 0, 1))

        img_ref = render_state(ref)
        img_sh = render_state(sh)
        cross = float(psnr_fn(jnp.asarray(img_sh), jnp.asarray(img_ref)))
        assert cross > 30.0, f"sharded vs single render PSNR {cross:.2f}"
        # sharded checkpoints written from sharded state
        assert os.path.exists(os.path.join(
            str(tmp_path / "sharded"), "point_cloud", "iteration_50",
            "point_cloud.ply"))
        assert os.path.exists(os.path.join(
            str(tmp_path / "sharded"), "chkpnt50.npz"))

    def test_meshnet_data_parallel_matches_single_device(self, tmp_path):
        """train_meshnet(data_parallel=True): 2 epochs on the virtual mesh
        == single-device (VERDICT r2 item 7)."""
        from cloth_splatting_tpu.data.trajectories import ClothSampleDataset
        from cloth_splatting_tpu.manipulation.collect import collect_dataset
        from cloth_splatting_tpu.models.cloth_simulator import init_cloth_simulator
        from cloth_splatting_tpu.train.meshnet_train import (
            MeshnetTrainer,
            train_meshnet,
        )

        root = str(tmp_path / "ds")
        collect_dataset(root, n_trajectories=2, nx=6, ny=6, n_steps=8,
                        seed=0)
        ds = ClothSampleDataset(root, input_seq_len=2, future_seq_len=1,
                                num_samples=30)
        rng = np.random.default_rng(0)
        state = init_cloth_simulator(rng, input_sequence_length=2,
                                     n_message_passing=2, latent=16)
        trainer = MeshnetTrainer(lr_init=1e-3, normalize=True)

        _, losses_ref = train_meshnet(
            trainer, state, ds, None, n_epochs=2, batch_size=8,
            curriculum=False, save_every=100, model_dir=None, seed=0,
            steps_per_epoch=1)
        _, losses_dp = train_meshnet(
            trainer, state, ds, None, n_epochs=2, batch_size=8,
            curriculum=False, save_every=100, model_dir=None, seed=0,
            steps_per_epoch=1, data_parallel=True)
        np.testing.assert_allclose(losses_dp, losses_ref, rtol=1e-4)

    def test_meshnet_cli_data_parallel_flag(self, tmp_path):
        """train_meshnet_sim.py --data_parallel plumbs through and writes
        checkpoints."""
        import glob

        import train_meshnet_sim
        from cloth_splatting_tpu.manipulation.collect import collect_dataset

        root = str(tmp_path / "ds")
        collect_dataset(root, n_trajectories=1, nx=6, ny=6, n_steps=8,
                        seed=0)
        model_path = str(tmp_path / "ckpt")
        train_meshnet_sim.main([
            "--mode", "train", "--data_path", root,
            "--data_val_path", "/nonexistent", "--batch_size", "8",
            "--ntraining_steps", "1", "--steps_per_epoch", "1",
            "--message_passing", "2", "--num_samples", "30",
            "--data_parallel", "1", "--model_path", model_path])
        assert glob.glob(model_path + "/*/model-*.npz")

    def test_resume_from_sharded_checkpoint(self, tmp_path):
        """checkpoint saved from a sharded run restores and resumes."""
        import os

        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.train.loop import train_scene

        scene_dir = str(tmp_path / "scene")
        generate_synthetic_scene(scene_dir, n_views=2, n_times=2,
                                 image_size=16, mesh_res=4,
                                 prediction_noise=0.0)
        scene = load_cloth_scene(scene_dir)
        cfg = Config()
        cfg.model.white_background = True
        cfg.opt.iterations = 6
        cfg.opt.static_reconst = True
        cfg.opt.static_reconst_iteration = 3
        cfg.opt.densify_from_iter = 1000
        cfg.opt.opacity_reset_interval = 10_000
        cfg.opt.raster_k_cap = 128
        out = str(tmp_path / "run")
        train_scene(cfg, scene, out, checkpoint_iterations=(3,),
                    progress_every=1000, seed=7, device_mesh=make_mesh(8))
        ckpt = os.path.join(out, "chkpnt3.npz")
        assert os.path.exists(ckpt)
        state = train_scene(cfg, scene, str(tmp_path / "resumed"),
                            start_checkpoint=ckpt, progress_every=1000,
                            seed=7, device_mesh=make_mesh(8))
        assert int(state.step) == 6
