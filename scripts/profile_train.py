#!/usr/bin/env python
"""Stage-level breakdown of the train step (fwd vs bwd vs optimizer/stats).

Builds the same synthetic scene as ``bench.py:measure_train_iters`` (3-camera
800x800 batch through the Pallas custom-VJP rasterizer) and times, each as
its own jitted program:

  * full        — trainer.step (value_and_grad + dual Adam + density stats)
  * fwd         — the loss forward only (render 3 cams + image/reg losses)
  * fwd_bwd     — value_and_grad of the same loss, no optimizer
  * fwd_nossim  — forward with lambda_dssim=0 (isolates the SSIM share)
  * derived: bwd = fwd_bwd - fwd, opt+stats = full - fwd_bwd,
             ssim_fwd = fwd - fwd_nossim

Prints one JSON line. Run on the TPU; informs where the next train-it/s win
lives (the rasterizer VJP vs SSIM vs the optimizer epilogue). The reference
has no analogous tooling (its CUDA timing is nvprof-external); this is the
framework-native path mirroring scripts/profile_serving.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_res", type=int, default=78,
                   help="78 -> 24.3k alive (parity-run scale); 128 -> 65k")
    p.add_argument("--capacity", type=int, default=32768)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--n_iters", type=int, default=20)
    p.add_argument("--pack_order", type=str, default="fused",
                   choices=("exact", "fused"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
    from cloth_splatting_tpu.models import gaussians as G
    from cloth_splatting_tpu.ops.camera import Camera
    from cloth_splatting_tpu.render import CameraArrays, RenderOutput, camera_arrays, render
    from cloth_splatting_tpu.train.config import Config
    from cloth_splatting_tpu.train.losses import image_losses, regularization
    from cloth_splatting_tpu.train.step import Trainer

    width = height = args.size
    fov = 2 * np.arctan(0.4)
    mesh = grid_cloth_mesh(args.mesh_res, args.mesh_res, size=1.4)
    cfg = Config()
    cfg.opt.raster_pack_order = args.pack_order
    trainer = Trainer(cfg, mesh, jnp.tile(mesh.pos[None], (3, 1, 1)),
                      width, height, np.tan(fov / 2), np.tan(fov / 2), 2.0)
    rng = np.random.default_rng(0)
    params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                      capacity=args.capacity)
    state = trainer.init_state(rng, params, gstate)
    cam = Camera.create(R=np.eye(3), t=np.asarray([0.0, 0.0, 3.0]),
                        fovx=fov, fovy=fov, width=width, height=height,
                        time=0.5)
    arrs = [camera_arrays(dataclasses.replace(cam, time=float(t)))
            for t in (0.0, 0.5, 1.0)]
    cams = CameraArrays(*[jnp.stack([getattr(a, f) for a in arrs])
                          for f in CameraArrays._fields])
    gts = jnp.full((3, 3, height, width), 0.5, jnp.float32)
    o = cfg.opt
    cap = state.params.face_bary.shape[0]

    def loss_fn(params, sim_params, screen_offset, lambda_dssim):
        def render_one(c):
            return render(
                c, width, height, trainer.tanfovx, trainer.tanfovy,
                params, state.gstate, mesh, sim_params,
                trainer.mesh_predictions, trainer.bg_color, 1,
                screen_offset=screen_offset, render_static=False,
                k_cap=o.raster_k_cap, k_chunk=o.raster_k_chunk,
                backend=trainer.backend, bg_static=trainer.bg_static,
                pack_order=args.pack_order)

        outs: RenderOutput = jax.lax.map(render_one, cams)
        loss, _ = image_losses(outs.rgb, gts, lambda_dssim, None)
        return loss + regularization(outs.vertices, mesh, o.lambda_deform_mag,
                                     o.lambda_rigid, o.lambda_momentum, False)

    screen_offset = jnp.zeros((cap, 2), jnp.float32)

    fwd = jax.jit(functools.partial(loss_fn, lambda_dssim=o.lambda_dssim))
    fwd_nossim = jax.jit(functools.partial(loss_fn, lambda_dssim=0.0))
    fwd_bwd = jax.jit(jax.value_and_grad(
        functools.partial(loss_fn, lambda_dssim=o.lambda_dssim),
        argnums=(0, 1, 2)))
    # finer arms (r5): differentiating w.r.t. gaussian params only lets XLA
    # DCE the simulator backward (vertices depend on sim_params alone), so
    # fwd_bwd - fwd_bwd_nosim = the GNN-backward share; dropping SSIM from
    # the differentiated loss isolates the SSIM VJP share
    fwd_bwd_nosim = jax.jit(jax.value_and_grad(
        functools.partial(loss_fn, lambda_dssim=o.lambda_dssim),
        argnums=(0, 2)))
    fwd_bwd_nossim = jax.jit(jax.value_and_grad(
        functools.partial(loss_fn, lambda_dssim=0.0),
        argnums=(0, 1, 2)))

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.n_iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / args.n_iters

    t_fwd = timeit(fwd, state.params, state.sim_params, screen_offset)
    t_fwd_nossim = timeit(fwd_nossim, state.params, state.sim_params,
                          screen_offset)
    t_fwd_bwd = timeit(fwd_bwd, state.params, state.sim_params, screen_offset)
    t_fwd_bwd_nosim = timeit(fwd_bwd_nosim, state.params, state.sim_params,
                             screen_offset)
    t_fwd_bwd_nossim = timeit(fwd_bwd_nossim, state.params, state.sim_params,
                              screen_offset)

    # full step (stateful: rebind args each call like the train loop does)
    st = state
    st, m = trainer.step(st, cams, gts, None, sh_degree=1, static=False)
    jax.block_until_ready(m.loss)
    t0 = time.time()
    for _ in range(args.n_iters):
        st, m = trainer.step(st, cams, gts, None, sh_degree=1, static=False)
    jax.block_until_ready(m.loss)
    t_full = (time.time() - t0) / args.n_iters

    print(json.dumps({
        "metric": "train_step_breakdown_ms",
        "mesh_res": args.mesh_res,
        "capacity": args.capacity,
        "pack_order": args.pack_order,
        "n_alive": int(4 * args.mesh_res * args.mesh_res * 2 / 2),
        "full_ms": round(t_full * 1e3, 2),
        "fwd_ms": round(t_fwd * 1e3, 2),
        "fwd_bwd_ms": round(t_fwd_bwd * 1e3, 2),
        "bwd_ms": round((t_fwd_bwd - t_fwd) * 1e3, 2),
        "opt_stats_ms": round((t_full - t_fwd_bwd) * 1e3, 2),
        "ssim_fwd_ms": round((t_fwd - t_fwd_nossim) * 1e3, 2),
        "sim_bwd_ms": round((t_fwd_bwd - t_fwd_bwd_nosim) * 1e3, 2),
        "ssim_total_ms": round((t_fwd_bwd - t_fwd_bwd_nossim) * 1e3, 2),
        "iters_per_sec_full": round(1.0 / t_full, 2),
    }))


if __name__ == "__main__":
    main()
