#!/usr/bin/env python
"""Diagnose the parity-bench PSNR ceiling (VERDICT r1 weak #2).

The parity scene's ground-truth PNGs are produced by the framework's own
renderer (data/synthetic.py), so a refit should in principle reach the
uint8-quantization ceiling (~48 dB). The fit plateaus at 28 dB. This script
bounds the achievable PSNR by re-rendering the KNOWN ground-truth Gaussian
parameters through each rasterizer tier and scoring them against the stored
PNGs:

  * tier used to make the PNGs (dense tiled, k_cap as in synthetic.py),
  * the capless exact-depth Pallas tier training actually optimizes through,
  * dense tiled with a large k_cap (isolates k_cap drops from depth-order
    quantization).

If the Pallas row lands near the observed 28 dB plateau, the ceiling is a
renderer-tier mismatch in GT generation, not a framework fit failure.
Prints one JSON line. Runs in minutes (no training).

Round 5: synthetic.py now renders GT through the SAME tier the eval path
uses (pallas_fwd off-CPU, tiled on CPU — VERDICT r4 weak #6 / next #3), so
on TPU the ``psnr_pallas_fwd`` row is the self-consistency ceiling (uint8
quantization only) and the tiled rows quantify cross-tier semantics drift;
``gt_tier`` in the output records which tier made the PNGs being scored.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, default="/tmp/parity_diag")
    p.add_argument("--image_size", type=int, default=800)
    p.add_argument("--mesh_res", type=int, default=24)
    p.add_argument("--n_views", type=int, default=24)
    p.add_argument("--n_times", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wave", type=str, default="stretchy",
                   choices=("stretchy", "isometric"))
    args = p.parse_args()

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
    from cloth_splatting_tpu.data.synthetic import (
        WAVES,
        generate_synthetic_scene,
        orbit_camera,
        target_gaussians,
    )
    from cloth_splatting_tpu.render import camera_arrays, render

    scene = os.path.join(args.workdir, "scene")
    generate_synthetic_scene(
        scene, n_views=args.n_views, n_times=args.n_times,
        image_size=args.image_size, mesh_res=args.mesh_res,
        prediction_noise=0.0, seed=args.seed, wave=args.wave)

    rest_mesh = grid_cloth_mesh(args.mesh_res, args.mesh_res, size=1.4)
    params, state = target_gaussians(rest_mesh, sh_degree=3, seed=args.seed)
    rest = np.asarray(rest_mesh.pos)
    times = np.linspace(0.0, 1.0, args.n_times)
    traj = np.stack([WAVES[args.wave](rest, t) for t in times])
    fov = 2 * np.arctan(0.4)
    bg = jnp.ones(3)
    size = args.image_size

    on_cpu = jax.default_backend() == "cpu"

    def make_render(backend, k_cap):
        @jax.jit
        def f(cam_arr, verts):
            out = render(cam_arr, size, size, 0.4, 0.4, params, state,
                         rest_mesh, None, None, bg, 3, render_static=True,
                         override_vertices=verts, k_cap=k_cap, k_chunk=16,
                         backend=backend, bg_static=(1.0, 1.0, 1.0))
            return out.rgb, out.n_dropped
        return f

    tiers = {
        "tiled_k256": make_render("tiled", 256),
        "tiled_k2048": make_render("tiled", 2048),
        "pallas_fwd": make_render("pallas_fwd", 0),
    }

    test_views = (1, 4)
    sq = {k: [] for k in tiers}
    dropped = {k: 0 for k in tiers}
    n_frames = 0
    for ti, t in enumerate(times):
        verts = jnp.asarray(traj[ti])
        for vi in test_views:
            png = imageio.imread(
                os.path.join(scene, "test", f"r_{vi}_{ti}.png"))
            rgba = png.astype(np.float32) / 255.0
            gt = rgba[..., :3] * rgba[..., 3:4] + (1.0 - rgba[..., 3:4])
            cam = orbit_camera(vi, args.n_views, fov, size, size, float(t))
            ca = camera_arrays(cam)
            for name, f in tiers.items():
                rgb, nd = f(ca, verts)
                img = np.asarray(jnp.clip(rgb, 0, 1)).transpose(1, 2, 0)
                sq[name].append(float(np.mean((img - gt) ** 2)))
                dropped[name] += int(nd)
            n_frames += 1

    out = {"metric": "parity_diag", "n_frames": n_frames,
           "image_size": size, "backend": jax.default_backend(),
           "gt_tier": "tiled_k256" if on_cpu else "pallas_fwd"}
    for name in tiers:
        mse = float(np.mean(sq[name]))
        out[f"psnr_{name}"] = round(-10.0 * np.log10(max(mse, 1e-12)), 2)
        out[f"dropped_{name}"] = dropped[name]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
