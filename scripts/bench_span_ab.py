#!/usr/bin/env python
"""A/B driver for the rasterizer span fast path (tiles_per_program > 1).

The Pallas walk is DMA-latency bound at realistic occupancy (~1 chunk per
32px tile), so fetching a whole multi-tile program's contiguous instance
span as ONE DMA (pallas_tiled/pallas_train span path) trades VMEM for
latency. This script measures both sides on the real chip:

  serving: one jitted lax.scan orbit over a camera bank (bench.py shape)
           at a given (tile, win, tpp, span_cap) against the tpp=1 default.
  train:   bench.measure_train_iters with rasterize_pallas_grad re-bound
           to the given (tpp, span_cap) — the custom-VJP path exercises the
           span port in BOTH the boundary-saving forward and the reverse
           sweep backward.

Each config prints one line and appends to --out (default /dev/null) so a
queue can run configs as separate serial processes (one TPU process at a
time). The checksum lets an A/B double as an exactness check: span on/off
must agree to float-accumulation noise.

Usage:
  python scripts/bench_span_ab.py serving --tpp 4 --span_cap 96
  python scripts/bench_span_ab.py train --tpp 4 --span_cap 96 \
      --mesh_res 78 --capacity 32768
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_serving(args) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
    from cloth_splatting_tpu.data.synthetic import orbit_camera, target_gaussians
    from cloth_splatting_tpu.models import gaussians as G
    from cloth_splatting_tpu.ops.projection import build_covariance, project_gaussians
    from cloth_splatting_tpu.ops.rasterize import pallas_tiled as PT
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
    interpret = jax.default_backend() == "cpu"

    def front(c):
        dirs = xyz - c.camera_center[None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = jnp.maximum(eval_sh(3, sh, dirs) + 0.5, 0.0)
        return project_gaussians(xyz, cov, colors, op, c.world_view,
                                 c.full_proj, w, h, np.tan(fov / 2),
                                 np.tan(fov / 2), alive=state.alive)

    @jax.jit
    def orbit(bank):
        def body(carry, c):
            rgb, _, _, _ = PT.rasterize_pallas(
                front(c), w, h, (1.0, 1.0, 1.0),
                tile_size=args.tile or None, win=args.win or None,
                tiles_per_program=args.tpp or None,
                span_cap=args.span_cap or None, interpret=interpret)
            return carry + rgb.mean(), rgb[:, ::200, ::200]
        return jax.lax.scan(body, 0.0, bank)

    s, _ = orbit(bank)
    jax.block_until_ready(s)
    t0 = time.time()
    jax.block_until_ready(orbit(bank))
    el = time.time() - t0
    return (f"serving tile={args.tile} win={args.win} tpp={args.tpp} "
            f"cap={args.span_cap}: {el * 1000 / args.n_views:.2f} ms/frame "
            f"({(args.n_views - 1) / el:.1f} fps) checksum={float(s):.6f}")


def run_train(args) -> str:
    import functools

    import cloth_splatting_tpu.ops.rasterize.pallas_train as PTR

    if args.tpp:
        PTR.rasterize_pallas_grad = functools.partial(
            PTR.rasterize_pallas_grad, tiles_per_program=args.tpp,
            span_cap=args.span_cap)

    import bench
    ips = bench.measure_train_iters(mesh_res=args.mesh_res,
                                    capacity=args.capacity)
    return (f"train tpp={args.tpp} cap={args.span_cap} "
            f"res={args.mesh_res} capacity={args.capacity}: {ips:.2f} it/s")


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["serving", "train"])
    p.add_argument("--tpp", type=int, default=0, help="0 = default (span off)")
    p.add_argument("--span_cap", type=int, default=96)
    p.add_argument("--tile", type=int, default=0, help="0 = auto")
    p.add_argument("--win", type=int, default=0, help="0 = auto")
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--n_views", type=int, default=16)
    p.add_argument("--mesh_res", type=int, default=78)
    p.add_argument("--capacity", type=int, default=32768)
    p.add_argument("--out", default=os.devnull)
    args = p.parse_args(argv)

    line = run_serving(args) if args.mode == "serving" else run_train(args)
    with open(args.out, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
