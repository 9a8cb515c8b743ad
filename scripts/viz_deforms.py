#!/usr/bin/env python
"""3D trajectory / deformation visualization from render.py deform logs.

Parity with the reference's scripts/viz_deforms.py: glob the per-time deform
npz dumps in a directory, stack the deformed Gaussian centers into [T, P, 3]
trajectories, and plot them as 3D lines (``--slice`` subsampling, ``--z_max``
filtering, optional rotating-gif ``--animation``). Accepts either this
framework's ``deform_log_*.npz`` files (render.py --log_deform), a merged
``all_trajs.npz``, or the reference's ``log_deform_*.npz`` naming.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.animation as animation  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402


def load_trajs(path: str) -> np.ndarray:
    """[T, P, 3] trajectories from a deform-log directory or all_trajs.npz."""
    if os.path.isfile(path):
        data = np.load(path)
        key = "traj" if "traj" in data else sorted(data.files)[0]
        return np.asarray(data[key])

    files = (glob.glob(os.path.join(path, "deform_log_*.npz"))
             or glob.glob(os.path.join(path, "log_deform_*.npz")))
    if not files:
        raise FileNotFoundError(f"no deform logs under {path}")

    def sort_key(f):
        nums = re.findall(r"[\d.]+", os.path.basename(f))
        return float(nums[-1]) if nums else 0.0

    files.sort(key=sort_key)
    frames = []
    for f in files:
        d = np.load(f)
        key = "means3D_deform" if "means3D_deform" in d else sorted(d.files)[0]
        frames.append(np.asarray(d[key]))
    return np.stack(frames)


def plot_trajs(trajs: np.ndarray, slice_: int, z_max: float | None,
               out: str, animate: bool) -> None:
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    _, p, _ = trajs.shape
    for i in range(0, p, slice_):
        if z_max is None or trajs[:, i, 2].max() < z_max:
            ax.plot(trajs[:, i, 0], trajs[:, i, 1], trajs[:, i, 2])
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.set_aspect("equal", adjustable="box")
    if animate:
        def rotate(angle):
            ax.view_init(azim=angle)

        rot = animation.FuncAnimation(fig, rotate,
                                      frames=np.arange(0, 362, 30),
                                      interval=50)
        gif = os.path.splitext(out)[0] + ".gif"
        rot.save(gif, dpi=80, writer="pillow")
        print(f"wrote {gif}")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(f"wrote {out}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, default="workspace",
                        help="deform-log directory or an all_trajs.npz file")
    parser.add_argument("--slice", type=int, default=10)
    parser.add_argument("--z_max", type=float, default=None)
    parser.add_argument("--animation", action="store_true")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)

    trajs = load_trajs(args.dir)
    print(f"trajs shape: {trajs.shape}")
    base = args.dir if os.path.isdir(args.dir) else os.path.dirname(args.dir)
    out = args.out or os.path.join(base, "viz_deforms.png")
    plot_trajs(trajs, max(args.slice, 1), args.z_max, out, args.animation)


if __name__ == "__main__":
    main(sys.argv[1:])
