"""Evaluation rendering: render train/test/video camera sets from a trained
checkpoint, measure FPS, export tracking logs.

Parity with the reference render.py (render.py:136-366): per-frame pngs under
``<model>/<split>/ours_<iter>/renders`` (+ gt), ``video_rgb.mp4`` at 30 fps,
FPS measured as (n_views - 1) / elapsed (render.py:300-301), ``--log_deform``
dumps per-time npz of deformed means/vertices/rotations merged into
``all_trajs.npz`` (render.py:34-57).
"""

from __future__ import annotations

import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.data.mesh_io import load_mesh_h5
from cloth_splatting_tpu.data.ply_io import read_ply
from cloth_splatting_tpu.data.scene import ClothScene
from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.models.deform import ResidualSimulatorParams, init_residual_simulator
from cloth_splatting_tpu.render import camera_arrays, render
from cloth_splatting_tpu.utils.checkpoints import (
    latest_checkpoint,
    load_flat,
    restore_like,
    search_max_iteration,
)


def load_gaussian_checkpoint(point_cloud_dir: str):
    """PLY + mesh.hdf5 -> (params, state, mesh) at rounded capacity."""
    cols = read_ply(os.path.join(point_cloud_dir, "point_cloud.ply"))
    mesh = load_mesh_h5(os.path.join(point_cloud_dir, "mesh.hdf5"))
    n = cols["x"].shape[0]
    cap = G.round_capacity(n)

    n_rest = len([k for k in cols if k.startswith("f_rest_")])
    k_rest = n_rest // 3

    def padded(arr, shape_tail):
        out = np.zeros((cap,) + shape_tail, np.float32)
        out[:n] = arr
        return jnp.asarray(out)

    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)[:, None, :]
    # channel-major storage back to [N, K-1, 3]
    f_rest = np.stack([cols[f"f_rest_{i}"] for i in range(n_rest)], axis=1)
    f_rest = f_rest.reshape(n, 3, k_rest).transpose(0, 2, 1)

    params = G.GaussianParams(
        face_bary=padded(np.stack([cols["b1"], cols["b2"], cols["b3"]], 1), (3,)),
        face_offset=padded(cols["o"][:, None], (1,)),
        features_dc=padded(f_dc, (1, 3)),
        features_rest=padded(f_rest, (k_rest, 3)),
        scaling=padded(np.stack([cols[f"scale_{i}"] for i in range(3)], 1), (3,)),
        rotation=padded(np.stack([cols[f"rot_{i}"] for i in range(4)], 1), (4,)),
        opacity=padded(cols["opacity"][:, None], (1,)),
    )
    alive = np.zeros(cap, bool)
    alive[:n] = True
    face_ids = np.zeros(cap, np.int32)
    face_ids[:n] = cols["id"].astype(np.int32)
    state = G.GaussianState(
        face_ids=jnp.asarray(face_ids),
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros(cap, jnp.float32),
        grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    return params, state, mesh


def load_trained_model(model_path: str, scene: ClothScene, iteration: int = -1):
    """Locate iteration, load PLY gaussians + residual simulator weights."""
    if iteration == -1:
        iteration = search_max_iteration(os.path.join(model_path, "point_cloud"))
        if iteration is None:
            raise FileNotFoundError(f"no point_cloud checkpoints in {model_path}")
    pc_dir = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
    params, state, mesh = load_gaussian_checkpoint(pc_dir)

    ckpt = latest_checkpoint(os.path.join(model_path, "meshnet"))
    if ckpt is None:
        raise FileNotFoundError(f"no meshnet checkpoint in {model_path}/meshnet")
    flat = load_flat(ckpt)
    if set(flat) == {"embedding"}:
        # --simulator embedding checkpoints hold just the [T, V*3] table
        from cloth_splatting_tpu.models.deform import EmbeddingSimulatorParams
        sim_params = EmbeddingSimulatorParams(
            embedding=jnp.asarray(flat["embedding"]))
    else:
        template = init_residual_simulator(
            np.random.default_rng(0), int(mesh.pos.shape[0]))._asdict()
        sim_params = ResidualSimulatorParams(**restore_like(template, flat))
    return params, state, mesh, sim_params, iteration


def render_set(
    model_path: str,
    split: str,
    iteration: int,
    cameras,
    gt_paths,
    params, state, mesh, sim_params, preds,
    white_background: bool,
    sh_degree: int = 3,
    log_deform: bool = False,
    track_vertices: bool = False,
    show_flow: bool = False,
    flow_skip: int | None = None,
    k_cap: int = 512,
) -> dict:
    """Render one camera list; returns {'fps': ..., 'out_dir': ...}."""
    import imageio.v2 as imageio

    out_dir = os.path.join(model_path, split, f"ours_{iteration}")
    renders_dir = os.path.join(out_dir, "renders")
    gts_dir = os.path.join(out_dir, "gt")
    os.makedirs(renders_dir, exist_ok=True)
    os.makedirs(gts_dir, exist_ok=True)

    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    cam0 = cameras[0]
    w, h = cam0.width, cam0.height

    # serving path: the forward-only Pallas kernel (no k_cap, exact depth)
    # whenever the frame tiles evenly on an accelerator; the dense XLA tier
    # remains the fallback for odd sizes and CPU
    use_pallas = (jax.default_backend() != "cpu"
                  and w % 16 == 0 and h % 16 == 0)
    bg_static = tuple(float(c) for c in np.asarray(bg))

    def make_render_one(cap):
        @jax.jit
        def render_one(cam_arr):
            return render(cam_arr, w, h, cam0.tanfovx, cam0.tanfovy, params,
                          state, mesh, sim_params, preds, bg, sh_degree,
                          k_cap=cap,
                          backend="pallas_fwd" if use_pallas else "tiled",
                          bg_static=bg_static)
        return render_one

    # warmup/compile outside the timed loop (parity with CUDA warm caches).
    # The dense tiled fallback truncates per-tile lists at k_cap while
    # training auto-grows its own cap (train/loop.py) — so a checkpoint can
    # legitimately need more than the default. Grow until nothing is
    # dropped: silently truncated eval renders once mis-scored a run by
    # ~9 dB (the pallas serving tier is capless; it reports 0 here).
    render_one = make_render_one(k_cap)
    if use_pallas:
        first = render_one(camera_arrays(cameras[0]))
    else:
        # scan EVERY frame for overflow (a later camera can pack a tile far
        # deeper than frame 0), growing until the whole set renders exact
        while True:
            dropped = 0
            for cam in cameras:
                first = render_one(camera_arrays(cam))
                dropped = max(dropped, int(first.n_dropped))
            if dropped == 0 or k_cap >= 8192:
                break
            k_cap *= 2
            print(f"{split}: rasterizer dropped {dropped} tile instances; "
                  f"growing eval k_cap -> {k_cap} (recompile)")
            render_one = make_render_one(k_cap)
    jax.block_until_ready(first.rgb)

    # Timed loop stays on device and KEEPS NOTHING (the reference's
    # convention times the render kernels, not the GPU->CPU image downloads,
    # render.py:300-301; through the TPU tunnel a per-frame 800x800 download
    # costs ~0.5 s and would measure the link, not the renderer). Frames are
    # then re-rendered streaming one at a time for export, so device memory
    # stays bounded at one RenderOutput regardless of camera count (long
    # video splits at large Gaussian counts must not accumulate).
    cam_arrs = [camera_arrays(cam) for cam in cameras]
    t0 = time.time()
    last = None
    for ca in cam_arrs:
        last = render_one(ca)
    jax.block_until_ready(last.rgb)
    elapsed = time.time() - t0
    fps = (len(cameras) - 1) / max(elapsed, 1e-9)

    frames = []
    deform_logs = []
    for ca in cam_arrs:
        out = render_one(ca)
        frames.append(np.asarray(jnp.clip(out.rgb, 0, 1)))
        if log_deform or show_flow:
            deform_logs.append({
                "means3D_deform": np.asarray(out.means3d),
                "vertice_deform": np.asarray(out.vertices),
                "rotations": np.asarray(out.rotations),
                "projections": np.asarray(out.projections),
                "depth": np.asarray(out.depth),
            })
    print(f"{split}: rendered {len(cameras)} views in {elapsed:.3f}s -> FPS {fps:.2f}")

    for i, (img, cam) in enumerate(zip(frames, cameras)):
        arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(renders_dir, f"{i:05d}.png"), arr)
        if gt_paths and i < len(gt_paths) and gt_paths[i]:
            from cloth_splatting_tpu.data.scene import decode_image

            gt = decode_image(gt_paths[i], white_background)
            imageio.imwrite(os.path.join(gts_dir, f"{i:05d}.png"),
                            gt.transpose(1, 2, 0))

    if len(frames) > 1:
        try:
            video = [(f.transpose(1, 2, 0) * 255).astype(np.uint8) for f in frames]
            imageio.mimwrite(os.path.join(out_dir, "video_rgb.mp4"), video, fps=30)
        except Exception as exc:  # codec availability varies
            print(f"video export skipped: {exc}")

    if show_flow:
        # occlusion-masked tracked points + trajectory tails
        # (reference render.py:226-286 --show_flow path)
        from cloth_splatting_tpu.eval.flow_viz import draw_tracks, occlusion_mask

        flow_dir = os.path.join(out_dir, "flow")
        os.makedirs(flow_dir, exist_ok=True)
        alive_idx = np.flatnonzero(np.asarray(state.alive))
        if flow_skip:
            # track every flow_skip-th Gaussian (reference --flow_skip)
            sel = alive_idx[::flow_skip]
        else:
            m = min(128, len(alive_idx))
            sel = alive_idx[np.linspace(0, len(alive_idx) - 1, m).astype(int)]
        track = [d["projections"][sel] for d in deform_logs]
        for t, (img, cam, d) in enumerate(zip(frames, cameras, deform_logs)):
            wv = np.asarray(camera_arrays(cam).world_view)  # row-vector W2C
            pts = d["means3D_deform"][sel]
            z = pts @ wv[:3, 2] + wv[3, 2]                  # camera depth
            vis = occlusion_mask(track[t], z, d["depth"][0])
            overlay = draw_tracks(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8),
                track[:t + 1], vis)
            imageio.imwrite(os.path.join(flow_dir, f"{t:05d}.png"), overlay)

    if log_deform:
        alive = np.asarray(state.alive)
        traj_key = "vertice_deform" if track_vertices else "means3D_deform"
        # ONE entry per unique time, in time order: the camera grid
        # interleaves views within each timestep ((v1,t0),(v4,t0),(v1,t1)...)
        # and all views at a time share the identical deformation state —
        # stacking raw camera order would corrupt the exported trajectory's
        # time axis (and every MTE computed from it)
        by_time: dict = {}
        for cam_obj, d in zip(cameras, deform_logs):
            tid = getattr(cam_obj, "time_id", -1)
            key = tid if tid is not None and tid >= 0 else float(cam_obj.time)
            if key not in by_time:
                by_time[key] = d
        time_logs = [by_time[k] for k in sorted(by_time)]
        trajs = np.stack([
            (d[traj_key] if track_vertices else d[traj_key][alive])
            for d in time_logs
        ])
        rots = np.stack([
            (d["rotations"] if not track_vertices else d["rotations"])
            for d in time_logs
        ])
        if not track_vertices:
            rots = rots[:, alive]
        np.savez(os.path.join(model_path, "all_trajs.npz"),
                 traj=trajs, rotations=rots)
        for t, d in enumerate(deform_logs):
            np.savez(os.path.join(out_dir, f"deform_log_{t:03d}.npz"), **d)

    return {"fps": fps, "out_dir": out_dir}
