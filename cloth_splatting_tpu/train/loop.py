"""Full scene-optimization loop (the reference's ``scene_reconstruction``,
train.py:90-221): static stage -> dynamic stage with 3-step camera batches,
density control + barycentric cleanup on schedule, SH-degree annealing, EMA
progress, held-out evaluation and PLY/simulator checkpointing.

TPU layout: all camera matrices and uint8 images are uploaded ONCE into
(view x time) banks; each iteration is a single compiled step addressed by
(view_idx, time_ids).
"""

from __future__ import annotations

import os
import time as time_mod
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.data.scene import CameraGrid, ClothScene, decode_image, decode_mask
from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.ops.image import psnr as psnr_fn
from cloth_splatting_tpu.render import CameraArrays, camera_arrays, render
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.step import SplatTrainState, StepCarry, Trainer
from cloth_splatting_tpu.utils.logging import MetricsLogger


def build_banks(grid: CameraGrid, white_background: bool):
    """Decode every frame once into device banks.

    Returns (cam_bank [V,T,...], gt_bank uint8 [V,T,3,H,W], mask_bank or None).
    """
    v, t = grid.n_views, grid.n_times
    cam0 = grid.get(0, 0).camera
    h, w = cam0.height, cam0.width
    cams = []
    gts = np.zeros((v, t, 3, h, w), dtype=np.uint8)
    any_mask = any(r.mask_path for r in grid.records)
    masks = np.ones((v, t, 1, h, w), dtype=np.float32) if any_mask else None
    for vi in range(v):
        row = []
        for ti in range(t):
            rec = grid.get(vi, ti)
            row.append(camera_arrays(rec.camera))
            if rec.image_path:
                gts[vi, ti] = decode_image(rec.image_path, white_background)
            if any_mask and rec.mask_path and os.path.exists(rec.mask_path):
                masks[vi, ti] = decode_mask(rec.mask_path)
        cams.append(row)
    cam_bank = CameraArrays(*[
        jnp.stack([jnp.stack([getattr(cams[vi][ti], f) for ti in range(t)])
                   for vi in range(v)])
        for f in CameraArrays._fields
    ])
    return cam_bank, jnp.asarray(gts), (jnp.asarray(masks) if masks is not None else None)


def evaluate_split(trainer: Trainer, state: SplatTrainState, grid: CameraGrid,
                   white_background: bool, sh_degree: int,
                   max_cameras: int = 20,
                   save_dir: str | None = None) -> dict[str, float]:
    """Held-out L1/PSNR over (a subset of) a camera grid; ``save_dir``
    dumps render/gt pairs (the reference's training_report image dumps,
    train.py:314)."""
    records = grid.records[:max_cameras]
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    def make_eval(k_cap):
        @jax.jit
        def eval_one(cam_arr, gt):
            out = render(
                cam_arr, trainer.width, trainer.height,
                trainer.tanfovx, trainer.tanfovy, state.params, state.gstate,
                trainer.mesh, state.sim_params, trainer.mesh_predictions,
                trainer.bg_color, sh_degree,
                k_cap=k_cap,
                k_chunk=min(trainer.cfg.opt.raster_k_chunk, k_cap),
                backend=trainer.backend, bg_static=trainer.bg_static,
            )
            img = jnp.clip(out.rgb, 0.0, 1.0)
            return psnr_fn(img, gt), jnp.mean(jnp.abs(img - gt)), out.n_dropped
        return eval_one

    # Same exactness contract as eval/render_sets.py: the capless pallas
    # tier reports 0 dropped; the dense tiled tier grows k_cap until the
    # whole split renders exact (a densified checkpoint can overflow the
    # TRAIN k_cap at held-out views — silently truncated eval renders once
    # under-reported a run by several dB).
    k_cap = trainer.cfg.opt.raster_k_cap
    while True:
        eval_one = make_eval(k_cap)
        psnrs, l1s, dropped = [], [], 0
        for rec in records:
            gt = jnp.asarray(decode_image(rec.image_path, white_background),
                             jnp.float32) / 255.0
            p, l1, nd = eval_one(camera_arrays(rec.camera), gt)
            psnrs.append(float(p))
            l1s.append(float(l1))
            dropped = max(dropped, int(nd))
        if dropped == 0 or k_cap >= 8192:
            break
        k_cap *= 2

    if save_dir:
        import imageio.v2 as imageio

        for i, rec in enumerate(records[:4]):
            out = render(
                camera_arrays(rec.camera), trainer.width, trainer.height,
                trainer.tanfovx, trainer.tanfovy, state.params, state.gstate,
                trainer.mesh, state.sim_params, trainer.mesh_predictions,
                trainer.bg_color, sh_degree,
                k_cap=k_cap,
                k_chunk=min(trainer.cfg.opt.raster_k_chunk, k_cap),
                backend=trainer.backend, bg_static=trainer.bg_static)
            img = np.asarray(jnp.clip(out.rgb, 0, 1))
            imageio.imwrite(
                os.path.join(save_dir, f"{rec.image_name or i}_render.png"),
                (img.transpose(1, 2, 0) * 255).astype(np.uint8))
    return {"psnr": float(np.mean(psnrs)), "l1": float(np.mean(l1s))}


def save_scene_checkpoint(out_dir: str, iteration: int, trainer: Trainer,
                          state: SplatTrainState) -> None:
    """PLY (+mesh.hdf5) + simulator weights, reference directory layout
    (train.py:196-203)."""
    from cloth_splatting_tpu.data.mesh_io import save_mesh_h5
    from cloth_splatting_tpu.data.ply_io import gaussian_ply_columns, write_ply
    from cloth_splatting_tpu.utils import checkpoints

    pc_dir = os.path.join(out_dir, "point_cloud", f"iteration_{iteration}")
    os.makedirs(pc_dir, exist_ok=True)
    alive = np.asarray(state.gstate.alive)
    p = state.params
    xyz = np.asarray(G.gaussian_positions(p, state.gstate, trainer.mesh))
    cols = gaussian_ply_columns(
        xyz[alive],
        np.asarray(p.features_dc)[alive],
        np.asarray(p.features_rest)[alive],
        np.asarray(p.opacity)[alive],
        np.asarray(p.scaling)[alive],
        np.asarray(p.rotation)[alive],
        face_bary=np.asarray(p.face_bary)[alive],
        face_offset=np.asarray(p.face_offset)[alive],
        face_ids=np.asarray(state.gstate.face_ids)[alive],
    )
    write_ply(os.path.join(pc_dir, "point_cloud.ply"), cols)
    save_mesh_h5(os.path.join(pc_dir, "mesh.hdf5"), trainer.mesh)

    meshnet_dir = os.path.join(out_dir, "meshnet")
    os.makedirs(meshnet_dir, exist_ok=True)
    checkpoints.save_pytree(os.path.join(meshnet_dir, f"model-{iteration}.npz"),
                            state.sim_params._asdict())


def save_train_checkpoint(out_dir: str, iteration: int,
                          state: SplatTrainState) -> str:
    """Full-train-state checkpoint (the reference's capture()/chkpnt<it>.pth,
    gaussian_model.py:62-94 + train.py:218-221) as one npz pytree."""
    from cloth_splatting_tpu.utils import checkpoints

    path = os.path.join(out_dir, f"chkpnt{iteration}.npz")
    checkpoints.save_pytree(path, state._asdict())
    return path


def load_train_checkpoint(path: str, template: SplatTrainState) -> SplatTrainState:
    from cloth_splatting_tpu.utils import checkpoints

    flat = checkpoints.load_flat(path)
    return checkpoints.restore_like(template, flat)


def _poll_viewer(trainer: Trainer, state,
                 sh_degree: int) -> None:
    """Non-blocking viewer poll per iteration (the reference's network_gui
    loop, train.py:129-144): accept a pending client, answer one render
    request if a camera arrived, drop the connection on any error.

    ``state`` may be a SplatTrainState or a zero-arg callable returning one
    — the mesh path passes a thunk so the (expensive) sharded-state gather
    only happens when a render request actually arrived."""
    from cloth_splatting_tpu.utils import viewer

    if viewer.conn is None:
        viewer.try_connect()
    if viewer.conn is None:
        return
    try:
        cam, do_training, keep_alive, scaling = viewer.receive()
        if cam is not None:
            state = state() if callable(state) else state
            wv = np.asarray(cam["world_view"], np.float32)
            fp = np.asarray(cam["full_proj"], np.float32)
            center = np.linalg.inv(wv.T)[:3, 3]
            arr = CameraArrays(world_view=jnp.asarray(wv),
                               full_proj=jnp.asarray(fp),
                               camera_center=jnp.asarray(center, jnp.float32),
                               time=jnp.asarray(cam["time"], jnp.float32))
            out = render(
                arr, cam["width"], cam["height"],
                trainer.tanfovx, trainer.tanfovy, state.params, state.gstate,
                trainer.mesh, state.sim_params, trainer.mesh_predictions,
                trainer.bg_color, sh_degree,
                scaling_modifier=scaling,
                k_cap=trainer.cfg.opt.raster_k_cap,
                k_chunk=trainer.cfg.opt.raster_k_chunk)
            img = np.asarray(jnp.clip(out.rgb, 0, 1))
            viewer.send((img.transpose(1, 2, 0) * 255)
                        .astype(np.uint8).tobytes())
        if not keep_alive:
            viewer.disconnect()
    except Exception:
        viewer.disconnect()


def sample_time_ids(rng: np.random.Generator, n_times: int,
                    three_steps_batch: bool,
                    time_sample: str = "interior") -> list[int]:
    """Pick this iteration's timestep batch.

    'interior' = the reference regime (MDNerfDataset.__getitem__,
    dataset.py:75-87): mid-time uniform over [1, T-2]; endpoint times then
    appear in only one window each (1/3 the interior exposure). 'balanced'
    draws the mid over the full range and clamps the window, doubling the
    endpoints' exposure.
    """
    if not three_steps_batch:
        return [int(rng.integers(n_times))]
    if n_times < 3:
        return list(range(n_times))
    if time_sample == "balanced":
        mid = int(rng.integers(0, n_times))
        mid = min(max(mid, 1), n_times - 2)
    else:
        mid = int(rng.integers(1, n_times - 1))
    return [mid - 1, mid, mid + 1]


def train_scene(
    cfg: Config,
    scene: ClothScene,
    out_dir: str,
    test_iterations: Sequence[int] = (),
    save_iterations: Sequence[int] = (),
    checkpoint_iterations: Sequence[int] = (),
    start_checkpoint: Optional[str] = None,
    seed: int = 6666,
    progress_every: int = 50,
    on_iteration: Optional[Callable[[int, dict], None]] = None,
    three_steps_batch: bool = True,
    save_test_images: bool = False,
    wandb=None,
    viewer_enabled: bool = False,
    device_mesh=None,
) -> SplatTrainState:
    """Run the full static+dynamic optimization for one scene.

    ``three_steps_batch=False`` selects the reference's FourDGSdataset
    regime (scene.py:131-137): ONE random (view, time) camera per dynamic
    iteration instead of the 3-consecutive-time batch (the consecutive-time
    regularizers need >= 3 cameras and fall away automatically).

    ``device_mesh``: a ``jax.sharding.Mesh`` with ('data', 'model') axes
    (see ``parallel.mesh.make_mesh``) runs every train iteration as the
    explicit shard_map program over that mesh — camera rows on 'data', the
    Gaussian capacity on 'model' — with the host schedule (density control,
    capacity growth, bary cleanup, kNN refresh, checkpoints) operating on
    the sharded state transparently. Single-device runs pass None and never
    touch the parallel layer.
    """
    os.makedirs(out_dir, exist_ok=True)
    o = cfg.opt
    rng = np.random.default_rng(seed)
    # (view, time) sampling draws from a DEDICATED stream — init_state
    # consumes `rng` for a shape-dependent number of draws, so sampling off
    # the same generator would make the sequence irreproducible by any
    # driver that initializes states differently. The scene-parallel sweep
    # (parallel/sweep.py) constructs this exact stream, which is what makes
    # sweep == N sequential runs EXACT (tests/test_scene_sweep.py).
    sample_rng = np.random.default_rng([seed, 1])
    key = jax.random.PRNGKey(seed)

    mesh = scene.initial_mesh
    preds = jnp.asarray(scene.mesh_predictions)
    cam0 = scene.train.get(0, 0).camera
    trainer = Trainer(cfg, mesh, preds, cam0.width, cam0.height,
                      cam0.tanfovx, cam0.tanfovy, scene.radius)
    driver = trainer
    if device_mesh is not None:
        from cloth_splatting_tpu.parallel.trainer import ShardedTrainer

        driver = ShardedTrainer(trainer, device_mesh)
        print(f"device mesh: data={driver.d_rows} x model={driver.m_cols} "
              f"({device_mesh.devices.size} devices)")
    state = trainer.init_state(rng)
    first_iter = 1
    if start_checkpoint:
        state = load_train_checkpoint(start_checkpoint, state)
        first_iter = int(state.step) + 1
        print(f"resumed from {start_checkpoint} at iteration {first_iter}")
    cam_bank, gt_bank, mask_bank = build_banks(scene.train, scene.white_background)
    if device_mesh is not None:
        state = driver.place_state(state)
        cam_bank = driver.replicate(cam_bank)
        gt_bank = driver.replicate(gt_bank)
        if mask_bank is not None:
            mask_bank = driver.replicate(mask_bank)

    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))
    sh_degree = min(first_iter // 1000, cfg.model.sh_degree)
    ema_loss, ema_psnr = 0.0, 0.0
    loss = psnr = 0.0
    n_alive = 0
    n_times = scene.train.n_times
    t_start = time_mod.time()

    # MD-Splatting kNN regularizers: neighborhoods refreshed on the host
    # schedule (reference train.py:397 knn_update_iter; recomputed when the
    # capacity changes, mirroring the diff_dimensions check)
    use_knn = (o.lambda_isometric > 0 or o.lambda_spring > 0
               or o.lambda_rigidity > 0)
    knn_state = None
    knn_capacity = -1

    # Device-resident EMA + overflow accumulator: smoothing stays
    # per-iteration (reference train.py:182) and k_cap overflow anywhere in
    # a progress window surfaces at the next tick, all without per-iteration
    # host fetches (each blocking fetch costs a ~25 ms tunnel round trip).
    carry = StepCarry.zeros()
    overflow_ticks = 0
    K_CAP_MAX = 8192

    # Polyak/EMA evaluation (config.param_ema): a tiny separate jitted
    # program per iteration — async dispatch, ~0 wall cost — instead of a
    # new SplatTrainState field, so checkpoints, sharding specs and density
    # surgery stay untouched. EMA covers BOTH param trees: Gaussian jitter
    # costs PSNR, simulator-weight jitter costs vertex accuracy (MTE).
    ema_decay = float(getattr(o, "param_ema", 0.0))
    ema_avg = None
    if ema_decay > 0.0:
        @jax.jit
        def _ema_update(avg, cur):
            return jax.tree_util.tree_map(
                lambda a, b: a * ema_decay + (1.0 - ema_decay) * b, avg, cur)

        @jax.jit
        def _ema_repair(avg_g, old_g, new_g):
            """Row-wise repair after a host event (densify/prune/reset/bary
            cleanup): rows whose params the event REWROTE get reloaded (a
            stale average would blend different Gaussians' identities);
            untouched rows keep their average — so an event landing on the
            save iteration doesn't silently discard the whole EMA."""
            changed = None
            for old, new in zip(jax.tree_util.tree_leaves(old_g),
                                jax.tree_util.tree_leaves(new_g)):
                row = jnp.any((old != new).reshape(old.shape[0], -1), axis=1)
                changed = row if changed is None else (changed | row)
            return jax.tree_util.tree_map(
                lambda a, n: jnp.where(
                    changed.reshape((-1,) + (1,) * (n.ndim - 1)), n, a),
                avg_g, new_g)

    def _with_ema(st):
        """State with eval-facing params swapped for their EMA."""
        if ema_avg is None:
            return st
        g, sim = jax.device_get(ema_avg)
        return st._replace(params=g, sim_params=sim)

    for iteration in range(first_iter, o.iterations + 1):
        static = o.static_reconst and iteration < o.static_reconst_iteration

        if viewer_enabled:
            # thunk: the sharded-state gather runs ONLY on a render request
            _poll_viewer(trainer,
                         (lambda s=state: driver.host_state(s))
                         if device_mesh is not None else state, sh_degree)

        if iteration % 1000 == 0 and sh_degree < cfg.model.sh_degree:
            sh_degree += 1

        knn_active = use_knn and not static and iteration > o.reg_iter
        if knn_active:
            cap = state.params.face_bary.shape[0]
            if (knn_state is None or cap != knn_capacity
                    or iteration % o.knn_update_iter == 0):
                knn_state = driver.compute_knn_state(state)
                knn_capacity = cap
                print("updating knn's")

        if static:
            vi = iteration % scene.train.n_views
            t_ids = [0]
        else:
            vi = int(sample_rng.integers(scene.train.n_views))
            t_ids = sample_time_ids(sample_rng, n_times, three_steps_batch,
                                    getattr(o, "time_sample", "interior"))

        state, metrics, carry = driver.step_banked(
            state, cam_bank, gt_bank, mask_bank, vi, t_ids,
            sh_degree=sh_degree, static=static,
            knn_state=knn_state if knn_active else None, carry=carry,
        )

        if ema_decay > 0.0:
            cur = (state.params, state.sim_params)
            ema_avg = cur if ema_avg is None else _ema_update(ema_avg, cur)

        host_event = (Trainer.density_control_due(cfg, iteration)
                      or iteration % o.bary_cleanup == 0)
        params_before = state.params if (ema_decay > 0.0 and host_event) \
            else None

        key, sub = jax.random.split(key)
        state, overflow = driver.density_control(state, iteration, sub)
        if overflow:
            print(f"[iter {iteration}] densify overflow: {overflow} "
                  f"(capacity {state.params.face_bary.shape[0]})")

        if iteration % o.bary_cleanup == 0:
            state = driver.cleanup_barycentric(state)

        if params_before is not None:
            if (state.params.face_bary.shape[0]
                    != params_before.face_bary.shape[0]):
                # capacity grew: shapes changed, restart the average
                ema_avg = (state.params, state.sim_params)
            else:
                ema_avg = (_ema_repair(ema_avg[0], params_before,
                                       state.params), ema_avg[1])

        # Metrics stay ON DEVICE between progress ticks: every blocking
        # device->host fetch costs a full round trip (~25 ms through the TPU
        # tunnel), and three per iteration dominated the loop (measured
        # ~1 it/s vs the ~24 it/s the step itself runs at). One batched
        # fetch every progress_every iterations (and whenever a callback or
        # eval needs real values) keeps the device queue full.
        need_fetch = (iteration % progress_every == 0
                      or iteration in test_iterations
                      or on_iteration is not None)
        if need_fetch:
            m, c = jax.device_get((metrics, carry))  # ONE round trip
            loss, psnr = float(m.loss), float(m.psnr)
            n_alive = int(m.n_alive)
            ema_loss, ema_psnr = float(c.ema_loss), float(c.ema_psnr)
            dropped_window = int(c.drop_accum)
            carry = carry._replace(drop_accum=jnp.zeros((), jnp.int32))
            # the dense tiled tier truncates per-tile lists at k_cap; that
            # must never pass silently (the pallas tier has no cap, reports
            # 0). Persistent overflow auto-doubles k_cap (one recompile),
            # restoring the CUDA tier's uncapped semantics.
            if dropped_window > 0:
                overflow_ticks += 1
                print(f"[iter {iteration}] WARNING: rasterizer dropped "
                      f"{dropped_window} tile instances since the last tick "
                      f"(k_cap={o.raster_k_cap})")
                if overflow_ticks >= 2 and o.raster_k_cap < K_CAP_MAX:
                    new_cap = driver.grow_k_cap()
                    overflow_ticks = 0
                    print(f"[iter {iteration}] growing raster_k_cap -> "
                          f"{new_cap} (recompile)")
            else:
                overflow_ticks = 0
        if iteration % progress_every == 0:
            rate = iteration / (time_mod.time() - t_start)
            print(f"[{'static' if static else 'dyn'} {iteration}/{o.iterations}] "
                  f"loss={ema_loss:.5f} psnr={ema_psnr:.2f} gaussians={n_alive} "
                  f"({rate:.1f} it/s)")
            logger.log(iteration, loss=loss, psnr=psnr, n_gaussians=n_alive,
                       iters_per_sec=rate)
            if wandb is not None:
                wandb.log({"loss": loss, "psnr": psnr,
                           "n_gaussians": n_alive}, step=iteration)

        if iteration in test_iterations:
            eval_state = (driver.host_state(state)
                          if device_mesh is not None else state)
            eval_state = _with_ema(eval_state)
            ev = evaluate_split(
                trainer, eval_state, scene.test, scene.white_background, sh_degree,
                save_dir=(os.path.join(out_dir, "test_renders",
                                       f"iter_{iteration}")
                          if save_test_images else None))
            print(f"[ITER {iteration}] test psnr={ev['psnr']:.2f} l1={ev['l1']:.4f}")
            logger.log(iteration, test_psnr=ev["psnr"], test_l1=ev["l1"])
            if wandb is not None:
                wandb.log({"test_psnr": ev["psnr"], "test_l1": ev["l1"]},
                          step=iteration)

        if iteration in save_iterations:
            # the saved PLY/mesh is the EVAL artifact (render.py/metrics.py
            # score it) -> averaged params; train-resume checkpoints below
            # keep the raw iterate
            save_scene_checkpoint(out_dir, iteration, trainer,
                                  _with_ema(state))

        if iteration in checkpoint_iterations:
            path = save_train_checkpoint(out_dir, iteration, state)
            print(f"[ITER {iteration}] saved checkpoint {path}")

        if on_iteration is not None:
            on_iteration(iteration, {"loss": loss, "psnr": psnr})

    return state
