#!/usr/bin/env python
"""Tracked-trajectory overlay figure (reference scripts/figure_4.py parity):
projects the exported deformed-Gaussian trajectories (all_trajs.npz) through
a camera projection (pose.json with a 4x4 full-projection matrix, or the
scene's transforms) and draws DAVIS-colored trajectory tails over the
rendered frames."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloth_splatting_tpu.eval.flow_viz import draw_tracks


def project_points(means3d: np.ndarray, full_proj: np.ndarray,
                   width: int = 800, height: int = 800) -> np.ndarray:
    """NDC -> pixel projection with the reference's row-vector convention
    (figure_4.py:13-28): p = [x 1] @ full_proj, pixel = ((ndc+1)*S - 1)/2."""
    h = np.concatenate([means3d, np.ones_like(means3d[:, :1])], axis=1)
    proj = h @ full_proj
    proj = proj / proj[:, 3:4]
    px = ((proj[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((proj[:, 1] + 1.0) * height - 1.0) * 0.5
    return np.stack([px, py], axis=1)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True,
                   help="render output dir with all_trajs.npz + images/ + pose.json")
    p.add_argument("--frame_end", type=int, default=40)
    p.add_argument("--n_tracks", type=int, default=200)
    p.add_argument("--tail", type=int, default=8)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import imageio.v2 as imageio

    trajs = np.load(os.path.join(args.folder, "all_trajs.npz"))["traj"]
    T = min(args.frame_end, trajs.shape[0])

    pose_path = os.path.join(args.folder, "pose.json")
    with open(pose_path) as f:
        pose = json.load(f)
    full_proj = np.asarray(pose["full_proj"], np.float64)
    width = int(pose.get("width", 800))
    height = int(pose.get("height", 800))

    frame_paths = sorted(glob.glob(os.path.join(args.folder, "images", "*.png")))
    rng = np.random.default_rng(0)
    ids = rng.choice(trajs.shape[1], size=min(args.n_tracks, trajs.shape[1]),
                     replace=False)
    visible = np.ones(len(ids), bool)

    out_dir = args.out or os.path.join(args.folder, "figure_4")
    os.makedirs(out_dir, exist_ok=True)
    proj_t = [project_points(trajs[t][ids], full_proj, width, height)
              for t in range(T)]
    for t in range(T):
        if t < len(frame_paths):
            img = imageio.imread(frame_paths[t])[..., :3].copy()
        else:
            img = np.full((height, width, 3), 255, np.uint8)
        tail = proj_t[max(0, t - args.tail):t + 1]
        img = draw_tracks(img, tail, visible, tail=args.tail)
        imageio.imwrite(os.path.join(out_dir, f"fig4_{t:04d}.png"), img)
    print(f"wrote {T} overlay frames -> {out_dir}")


if __name__ == "__main__":
    main()
