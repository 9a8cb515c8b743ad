#!/usr/bin/env python
"""Keypoint inspection over collected sim datasets (reference
manipulation/keypoint_inspection.py): for each mesh id in a dataset, grab the
first frame of the first trajectory and save an annotated image for manual
keypoint selection.

The reference dumps the stored ``camera_0_rgbd`` frame; our trajectories
store particle states (manipulation/collect.py h5 format), so the first
frame is drawn as a top-down particle scatter with the environment keypoints
(corners + edge midpoints + center, manipulation/env.py keypoint_ids)
highlighted and labeled — strictly more useful for picking grasp indices.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloth_splatting_tpu.data.trajectories import load_sim_trajectory  # noqa: E402


def _grid_keypoints(n_particles: int) -> list[int]:
    """Corners + edge midpoints + center of an (assumed square) grid cloth."""
    n = int(round(np.sqrt(n_particles)))
    if n * n != n_particles:
        return []
    def idx(i, j):
        return i * n + j
    m = n // 2
    return [idx(0, 0), idx(0, n - 1), idx(n - 1, 0), idx(n - 1, n - 1),
            idx(0, m), idx(n - 1, m), idx(m, 0), idx(m, n - 1), idx(m, m)]


def inspect_dataset(dataset_root: str, out_root: str,
                    iteration_id: int = 0) -> list[str]:
    written = []
    env_dirs = sorted(d for d in glob.glob(os.path.join(dataset_root, "*"))
                      if os.path.isdir(d))
    for env_dir in env_dirs:
        mesh_id = os.path.basename(env_dir)
        trajs = sorted(d for d in glob.glob(os.path.join(env_dir, "*"))
                       if os.path.isdir(d))
        if iteration_id >= len(trajs):
            continue
        data = load_sim_trajectory(trajs[iteration_id])
        pos0 = np.asarray(data["pos"][0])

        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(pos0[:, 0], pos0[:, 1], s=4, c=pos0[:, 2], cmap="viridis")
        for k in _grid_keypoints(pos0.shape[0]):
            ax.scatter(pos0[k, 0], pos0[k, 1], s=60, facecolors="none",
                       edgecolors="r")
            ax.annotate(str(k), (pos0[k, 0], pos0[k, 1]), color="r",
                        fontsize=8)
        ax.set_aspect("equal")
        ax.set_title(f"{mesh_id} traj {iteration_id:05d}")

        out_dir = os.path.join(out_root, mesh_id, f"{iteration_id:05d}")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "img_0.png")
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        written.append(out_path)
        print(f"wrote {out_path}")
    return written


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True,
                   help="sim dataset root (ENV/traj_* dirs)")
    p.add_argument("--out", type=str, default="data/figs")
    p.add_argument("--iteration_id", type=int, default=0)
    args = p.parse_args(argv)
    inspect_dataset(args.dataset, args.out, args.iteration_id)


if __name__ == "__main__":
    main()
