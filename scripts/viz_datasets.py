#!/usr/bin/env python
"""Animate a transforms dataset (reference scripts/viz_datasets.py parity):
step through frames so every next frame is a new viewpoint one timestep
later, writing <scene>_animation.mp4 (or a png contact sheet without
imageio-ffmpeg)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def frame_order(frames: list[dict]) -> list[int]:
    """Interleave views and times: index stride = n_times + 1 modulo len."""
    all_times = [fr["time"] for fr in frames]
    n_times = np.unique(all_times).shape[0]
    skip = n_times + 1
    n = len(frames)
    return [(i * skip) % n for i in range(n)]


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, nargs="+", required=True,
                   help="transforms_*.json files")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args(argv)

    import imageio.v2 as imageio

    for input_path in args.input:
        with open(input_path) as f:
            data = json.load(f)
        base_dir = os.path.dirname(os.path.abspath(input_path))
        frames = data["frames"]
        order = frame_order(frames)
        scene_name = os.path.basename(base_dir)
        out = os.path.join(base_dir, scene_name + "_animation.mp4")
        imgs = []
        for i in order:
            fp = frames[i]["file_path"]
            if not os.path.splitext(fp)[1]:
                fp += ".png"
            imgs.append(imageio.imread(os.path.join(base_dir, fp)))
        try:
            imageio.mimwrite(out, imgs, fps=args.fps)
            print(f"wrote {out} ({len(imgs)} frames)")
        except Exception as e:   # no ffmpeg backend: fall back to contact sheet
            out = out.replace(".mp4", "_sheet.png")
            k = min(16, len(imgs))
            rows = np.concatenate([np.concatenate(imgs[r * 4:r * 4 + 4], axis=1)
                                   for r in range(k // 4)], axis=0)
            imageio.imwrite(out, rows)
            print(f"no video backend ({e}); wrote {out}")


if __name__ == "__main__":
    main()
