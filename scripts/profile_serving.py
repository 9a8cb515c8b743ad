#!/usr/bin/env python
"""Stage-level breakdown of the serving frame (pack vs kernel vs front-end).

Times, each as its own jitted lax.scan over the camera bank (the bench.py
measurement shape):

  * full        — projection + SH + sorted_pack + Pallas compositing
  * front_end   — SH eval + EWA projection only
  * pack        — front_end + sorted_pack (sort-binning, no kernel)
  * kernel-only — full minus pack (derived)

Prints one JSON line. Run on the TPU; informs where the next serving-FPS
win lives (the compositor kernel vs the XLA binning sort vs per-Gaussian
math).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_res", type=int, default=128, help="128 -> 65k")
    p.add_argument("--n_views", type=int, default=40)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--pack_order", type=str, default="fused",
                   choices=("exact", "fused"),
                   help="instance-ordering strategy under test (the pack "
                        "was 34% of the r3 frame; 'fused' is the single-"
                        "i32-key CUDA-semantics sort, the default since the "
                        "r05a A/B)")
    p.add_argument("--tpp", type=int, default=0,
                   help="tiles_per_program override (0 = kernel default)")
    p.add_argument("--span_cap", type=int, default=0,
                   help="span fast-path cap in chunks (needs --tpp > 1)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
    from cloth_splatting_tpu.data.synthetic import orbit_camera, target_gaussians
    from cloth_splatting_tpu.models import gaussians as G
    from cloth_splatting_tpu.ops.projection import build_covariance, project_gaussians
    from cloth_splatting_tpu.ops.rasterize.pallas_tiled import (
        raster_forward_tiles,
        rasterize_pallas,
        sorted_pack,
    )
    from cloth_splatting_tpu.ops.sh import eval_sh
    from cloth_splatting_tpu.render import CameraArrays, camera_arrays

    w = h = args.size
    fov = 2 * np.arctan(0.4)
    mesh = grid_cloth_mesh(args.mesh_res, args.mesh_res, size=1.4)
    params, state = target_gaussians(mesh, 3)
    cams = [camera_arrays(orbit_camera(v, args.n_views, fov, w, h, 0.0))
            for v in range(args.n_views)]
    bank = CameraArrays(*[jnp.stack([getattr(c, f) for c in cams])
                          for f in CameraArrays._fields])

    xyz = G.gaussian_positions(params, state, mesh)
    cov = build_covariance(G.get_scaling(params), params.rotation)
    sh = G.get_features(params)
    op = G.get_opacity(params)

    tile_size = 32 if (w % 32 == 0 and h % 32 == 0 and min(w, h) >= 512) else 16
    win = 5 if tile_size == 16 else 3
    tw, th = w // tile_size, h // tile_size

    def front(c):
        dirs = xyz - c.camera_center[None]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = jnp.maximum(eval_sh(3, sh, dirs) + 0.5, 0.0)
        return project_gaussians(xyz, cov, colors, op, c.world_view,
                                 c.full_proj, w, h, 0.4, 0.4,
                                 alive=state.alive)

    interpret = jax.default_backend() == "cpu"

    def stage_full(c):
        proj = front(c)
        rgb, _, _, _ = rasterize_pallas(proj, w, h, (1.0, 1.0, 1.0),
                                        interpret=interpret,
                                        pack_order=args.pack_order,
                                        tiles_per_program=args.tpp or None,
                                        span_cap=args.span_cap or None)
        return rgb[:, ::200, ::200]

    def stage_pack(c):
        proj = front(c)
        packed = sorted_pack(proj, tw, th, tile_size, win,
                             order=args.pack_order)
        return packed.rows16[:, ::999], packed.starts[::37]

    def stage_front(c):
        proj = front(c)
        return proj.xy[::999], proj.conic[::999]

    def timed(fn):
        @jax.jit
        def orbit(bank):
            def body(carry, c):
                out = fn(c)
                probe = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
                return carry + probe, None
            return jax.lax.scan(body, 0.0, bank)[0]

        jax.block_until_ready(orbit(bank))
        t0 = time.time()
        jax.block_until_ready(orbit(bank))
        return (time.time() - t0) / args.n_views * 1000.0   # ms / frame

    full_ms = timed(stage_full)
    pack_ms = timed(stage_pack)
    front_ms = timed(stage_front)
    print(json.dumps({
        "metric": "serving_breakdown_ms_per_frame",
        "n_gaussians": int(np.sum(np.asarray(state.alive))),
        "size": args.size,
        "pack_order": args.pack_order,
        "tpp": args.tpp,
        "span_cap": args.span_cap,
        "full": round(full_ms, 3),
        "front_end": round(front_ms, 3),
        "pack_incl_front": round(pack_ms, 3),
        "pack_only": round(pack_ms - front_ms, 3),
        "kernel_only": round(full_ms - pack_ms, 3),
        "fps_equiv": round(1000.0 / full_ms, 1),
    }))


if __name__ == "__main__":
    main()
