#!/usr/bin/env python
"""Assemble a frame sequence from coarse/fine render dumps (reference
scripts/select_image.py parity, generalized): pick every --stride-th image
from one or more render directories (in order), ping-ponging through time,
and write them as a numbered sequence (for paper progress strips / videos)."""

from __future__ import annotations

import argparse
import glob
import os
import shutil


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dirs", type=str, nargs="+", required=True,
                   help="render image dirs, concatenated in order")
    p.add_argument("--stride", type=int, default=10)
    p.add_argument("--pingpong", action="store_true",
                   help="reverse direction on alternate passes")
    p.add_argument("--out", type=str, default="./selected_frames")
    args = p.parse_args(argv)

    paths = []
    for d in args.dirs:
        imgs = sorted(glob.glob(os.path.join(d, "*.png"))
                      + glob.glob(os.path.join(d, "*.jpg")))
        paths.extend(imgs)
    selected = paths[::args.stride]
    if args.pingpong:
        selected = selected + selected[-2::-1]

    os.makedirs(args.out, exist_ok=True)
    for i, src in enumerate(selected):
        shutil.copyfile(src, os.path.join(
            args.out, f"{i:05d}{os.path.splitext(src)[1]}"))
    print(f"{len(selected)} frames -> {args.out}")


if __name__ == "__main__":
    main()
