#!/usr/bin/env python
"""Static free-xyz 3DGS fit over legacy datasets (COLMAP / NeRF-synthetic).

The reference ships loaders for these formats (dataset_readers.py
sceneLoadTypeCallbacks) whose training path is its stale full_eval harness;
here the same surface is live: load the scene, initialize the free-xyz
point-cloud Gaussian model from its point cloud, run the static fit, render
the test cameras and report PSNR.

Usage:
  python fit_legacy.py -s /data/colmap_scene --type Colmap --iterations 500
  python fit_legacy.py -s /data/lego --type Blender -w
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Static 3DGS fit on legacy scenes")
    p.add_argument("--source_path", "-s", type=str, required=True)
    p.add_argument("--model_path", "-m", type=str, default="./output/legacy")
    p.add_argument("--type", choices=["Colmap", "Blender"], default="Colmap")
    p.add_argument("--images", type=str, default=None,
                   help="COLMAP images subdirectory")
    p.add_argument("--eval", action="store_true", default=False,
                   help="hold out every llffhold-th camera (reference "
                        "ModelParams.eval default False)")
    p.add_argument("--llffhold", type=int, default=8)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--iterations", type=int, default=500)
    p.add_argument("--max_cameras", type=int, default=50,
                   help="cap on decoded training cameras (memory)")
    p.add_argument("--k_cap", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from cloth_splatting_tpu.data.legacy import (
        load_colmap_scene,
        load_dnerf_scene,
    )
    from cloth_splatting_tpu.data.scene import decode_image
    from cloth_splatting_tpu.models import point_gaussians as PG
    from cloth_splatting_tpu.ops.image import psnr
    from cloth_splatting_tpu.render import camera_arrays

    if args.type == "Colmap":
        scene = load_colmap_scene(args.source_path, images=args.images,
                                  eval_split=args.eval, llffhold=args.llffhold)
    else:
        scene = load_dnerf_scene(args.source_path,
                                 white_background=args.white_background,
                                 eval_split=args.eval, seed=args.seed)
    if scene.point_cloud is None:
        raise SystemExit("scene has no point cloud to initialize from")

    cam0 = scene.train[0].camera
    w, h = cam0.width, cam0.height
    tanx, tany = np.tan(cam0.fovx / 2), np.tan(cam0.fovy / 2)
    # COLMAP reconstructions can mix camera models/sizes; the fit is jitted
    # at one (w, h, fov), so keep only cameras matching the first one
    same_cam = [r for r in scene.train
                if (r.camera.width, r.camera.height) == (w, h)
                and abs(r.camera.fovx - cam0.fovx) < 1e-9]
    if len(same_cam) < len(scene.train):
        print(f"dropping {len(scene.train) - len(same_cam)} cameras with "
              f"differing intrinsics (fit is single-intrinsics)")
    recs = same_cam[:args.max_cameras]
    cams, gts = [], []
    for r in recs:
        cams.append(camera_arrays(r.camera))
        img = decode_image(r.image_path, args.white_background)
        gts.append(jnp.asarray(img, jnp.float32) / 255.0)
    print(f"{args.type} scene: {len(recs)} train cams {w}x{h}, "
          f"{scene.point_cloud.points.shape[0]} init points, "
          f"radius {scene.radius:.3f}")

    params, state, loss = PG.fit_static_scene(
        cams, gts, scene.point_cloud, w, h, tanx, tany,
        sh_degree=args.sh_degree, iterations=args.iterations,
        seed=args.seed, k_cap=args.k_cap,
        white_background=args.white_background)
    print(f"final train loss: {loss:.5f}")

    # held-out evaluation (same-intrinsics cameras only)
    test = [r for r in scene.test
            if (r.camera.width, r.camera.height) == (w, h)][:10] or recs[:4]
    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    psnrs = []
    for r in test:
        rgb, _, _ = PG.render_points(params, state, camera_arrays(r.camera),
                                     w, h, tanx, tany, bg, args.sh_degree,
                                     k_cap=args.k_cap)
        gt = jnp.asarray(decode_image(r.image_path, args.white_background),
                         jnp.float32) / 255.0
        psnrs.append(float(psnr(jnp.clip(rgb, 0, 1)[None], gt[None])[0]))
    mean_psnr = float(np.mean(psnrs))
    print(f"test PSNR: {mean_psnr:.2f} dB over {len(test)} cameras")

    os.makedirs(args.model_path, exist_ok=True)
    from cloth_splatting_tpu.data.ply_io import gaussian_ply_columns, write_ply

    alive = np.asarray(state.alive)
    cols = gaussian_ply_columns(
        np.asarray(params.xyz)[alive],
        np.asarray(params.features_dc)[alive],
        np.asarray(params.features_rest)[alive],
        np.asarray(params.opacity)[alive],
        np.asarray(params.scaling)[alive],
        np.asarray(params.rotation)[alive])
    write_ply(os.path.join(args.model_path, "point_cloud.ply"), cols)
    with open(os.path.join(args.model_path, "results.json"), "w") as f:
        json.dump({"ours_static": {"PSNR": mean_psnr,
                                   "final_loss": loss,
                                   "iterations": args.iterations}}, f, indent=2)
    print(f"-> {args.model_path}")


if __name__ == "__main__":
    main()
