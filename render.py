#!/usr/bin/env python
"""Evaluation rendering CLI (reference render.py:319-412 parity).

Renders train/test/video splits from a trained model, prints FPS as
``(n_views - 1) / elapsed``, writes per-frame pngs + video_rgb.mp4, and with
``--log_deform`` exports the tracked 3D trajectories (all_trajs.npz) used by
the MTE tooling; ``--track_vertices`` switches tracking from Gaussians to
mesh vertices.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Cloth-Splatting TPU renderer")
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_video", action="store_true")
    parser.add_argument("--log_deform", action="store_true")
    parser.add_argument("--track_vertices", action="store_true")
    parser.add_argument("--show_flow", action="store_true")
    parser.add_argument("--flow_skip", type=int, default=None,
                        help="track every N-th Gaussian in --show_flow overlays")
    parser.add_argument("--view_skip", type=int, default=1)
    parser.add_argument("--time_skip", type=int, default=1)
    parser.add_argument("--single_cam_video", action="store_true")
    parser.add_argument("--white_background", "-w", action="store_true", default=True)
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--configs", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    # merge saved cfg_args (reference get_combined_args, arguments/__init__.py:176)
    cfg_path = os.path.join(args.model_path, "cfg_args")
    if os.path.exists(cfg_path) and args.source_path is None:
        from argparse import Namespace  # noqa: F401 (used by eval)

        with open(cfg_path) as f:
            saved = eval(f.read())
        args.source_path = getattr(saved, "source_path", None)

    if not args.source_path:
        parser.error("--source_path required (not found in cfg_args)")

    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.data.scene import load_cloth_scene
    from cloth_splatting_tpu.eval.render_sets import load_trained_model, render_set

    time_skip = args.time_skip if args.time_skip > 1 else None
    view_skip = args.view_skip if args.view_skip > 1 else None
    scene = load_cloth_scene(args.source_path, args.white_background, True,
                             time_skip=time_skip, view_skip=view_skip,
                             single_cam_video=args.single_cam_video)
    params, state, mesh, sim_params, iteration = load_trained_model(
        args.model_path, scene, args.iteration)
    preds = jnp.asarray(scene.mesh_predictions)

    def split_cams(grid):
        cams = [r.camera for r in grid.records]
        paths = [r.image_path for r in grid.records]
        return cams, paths

    results = {}
    if not args.skip_train:
        cams, paths = split_cams(scene.train)
        results["train"] = render_set(
            args.model_path, "train", iteration, cams, paths, params, state,
            mesh, sim_params, preds, args.white_background, args.sh_degree,
            log_deform=args.log_deform, track_vertices=args.track_vertices,
            show_flow=args.show_flow, flow_skip=args.flow_skip)
    if not args.skip_test:
        cams, paths = split_cams(scene.test)
        results["test"] = render_set(
            args.model_path, "test", iteration, cams, paths, params, state,
            mesh, sim_params, preds, args.white_background, args.sh_degree,
            log_deform=args.log_deform, track_vertices=args.track_vertices,
            show_flow=args.show_flow, flow_skip=args.flow_skip)
    if not args.skip_video:
        results["video"] = render_set(
            args.model_path, "video", iteration, scene.video_cameras, None,
            params, state, mesh, sim_params, preds, args.white_background,
            args.sh_degree, show_flow=args.show_flow, flow_skip=args.flow_skip)
    for split, r in results.items():
        print(f"{split}: FPS {r['fps']:.2f} -> {r['out_dir']}")


if __name__ == "__main__":
    main()
