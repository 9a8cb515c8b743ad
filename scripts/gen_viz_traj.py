#!/usr/bin/env python
"""Generate a visualization camera trajectory (reference
scripts/gen_viz_traj.py parity): take the unique test-camera poses of a
scene, assign ping-pong times (0 -> 1 -> 0) so the trajectory sweeps forward
then backward through scene time while orbiting the cameras, optionally
densify by inserting time/pose midpoints, and write the result as
``video.json`` (the render.py video split consumes it)."""

from __future__ import annotations

import argparse
import copy
import json
import os

import numpy as np


def build_traj(data: dict, single_cam: bool = False,
               densify: bool = False) -> dict:
    frames = data["frames"]
    cam_positions = np.stack([np.asarray(fr["transform_matrix"])[:3, 3]
                              for fr in frames])
    _, idx = np.unique(cam_positions, axis=0, return_index=True)
    idx = np.sort(idx)
    n_poses = len(idx)

    dt = 1.0 / max(n_poses // 2 - 1, 1)
    times = np.arange(0.0, 1.0 + dt / 2, dt)
    times = np.concatenate([times, times[::-1]])[:n_poses]

    out_frames = []
    for k, i in enumerate(idx):
        frame = copy.deepcopy(frames[0] if single_cam else frames[int(i)])
        frame["time"] = float(times[k % len(times)])
        out_frames.append(frame)

    if densify:
        originals = out_frames
        out_frames = []
        for i in range(len(originals) - 1):
            out_frames.append(originals[i])
            mid = copy.deepcopy(originals[i])
            mid["time"] = (originals[i]["time"] + originals[i + 1]["time"]) / 2
            mid["transform_matrix"] = (
                (np.asarray(originals[i]["transform_matrix"])
                 + np.asarray(originals[i + 1]["transform_matrix"])) / 2
            ).tolist()
            out_frames.append(mid)
        out_frames.append(originals[-1])

    traj = copy.deepcopy(data)
    traj["frames"] = out_frames
    return traj


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True,
                   help="scene dir with transforms_test.json")
    p.add_argument("--densify", action="store_true")
    p.add_argument("--single_cam", action="store_true",
                   help="hold the first camera, sweep only time")
    args = p.parse_args(argv)

    with open(os.path.join(args.folder, "transforms_test.json")) as f:
        data = json.load(f)
    traj = build_traj(data, single_cam=args.single_cam, densify=args.densify)
    out = os.path.join(args.folder, "video.json")
    with open(out, "w") as f:
        json.dump(traj, f, indent=2)
    print(f"{len(traj['frames'])} video frames -> {out}")


if __name__ == "__main__":
    main()
