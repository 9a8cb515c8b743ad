#!/usr/bin/env python
"""Model-size accounting (reference scripts/cal_modelsize.py parity): sum the
saved artifact sizes (point_cloud.ply + mesh.hdf5 + meshnet checkpoint) per
scene under an output root and print the per-scene average in MB."""

from __future__ import annotations

import argparse
import glob
import os


ARTIFACT_GLOBS = (
    "point_cloud/iteration_*/point_cloud.ply",
    "point_cloud/iteration_*/mesh.hdf5",
    "point_cloud/coarse_iteration_*/point_cloud.ply",
    "meshnet/model-*.npz",
    "meshnet/model-*.pt",
)


def scene_size_mb(scene_dir: str) -> float:
    total = 0
    for pattern in ARTIFACT_GLOBS:
        for path in glob.glob(os.path.join(scene_dir, pattern)):
            total += os.path.getsize(path)
    return total / (1024 * 1024)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--output", type=str, default="./output",
                   help="root containing per-scene experiment directories")
    args = p.parse_args(argv)

    scene_dirs = sorted(d for d in glob.glob(os.path.join(args.output, "*"))
                        if os.path.isdir(d))
    sizes = []
    for d in scene_dirs:
        mb = scene_size_mb(d)
        if mb > 0:
            sizes.append(mb)
            print(f"{os.path.basename(d)}: {mb:.2f} MB")
    if sizes:
        print(f"average size (MB): {sum(sizes) / len(sizes):.2f}")
    else:
        print("no artifacts found")


if __name__ == "__main__":
    main()
