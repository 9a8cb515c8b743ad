#!/usr/bin/env python
"""Prune a transforms dataset to its first N timesteps (reference
scripts/prune_dataset.py parity): keep frames whose time is among the first
n_frames unique times, renormalize times to [0, 1], rewrite the json (the
originals are kept with an `_all` suffix), and list the now-unused images."""

from __future__ import annotations

import argparse
import copy
import json
import os

import numpy as np


def prune_json(json_name: str, n_frames: int) -> list[str]:
    with open(json_name) as f:
        data = json.load(f)
    frames = data["frames"]
    unique_times = np.unique([fr["time"] for fr in frames])
    valid_times = unique_times[:n_frames]
    n_kept = len(valid_times)       # dataset may have fewer than n_frames
    new_times = (np.arange(n_kept) / max(n_kept - 1, 1)).tolist()

    new_frames, dropped = [], []
    for frame in frames:
        t = frame["time"]
        if t in valid_times:
            fr = copy.deepcopy(frame)
            fr["time"] = new_times[int(np.where(valid_times == t)[0][0])]
            new_frames.append(fr)
        else:
            dropped.append(frame["file_path"])

    backup = json_name.replace(".json", "_all.json")
    if not os.path.exists(backup):
        os.rename(json_name, backup)
    data_new = copy.deepcopy(data)
    data_new["frames"] = new_frames
    with open(json_name, "w") as f:
        json.dump(data_new, f, indent=2)
    return dropped


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True,
                   help="scene directory with transforms_{train,test}.json")
    p.add_argument("--n_frames", type=int, default=40)
    args = p.parse_args(argv)

    for split in ("transforms_train.json", "transforms_test.json", "video.json"):
        path = os.path.join(args.dataset, split)
        if not os.path.exists(path):
            continue
        dropped = prune_json(path, args.n_frames)
        print(f"{split}: kept first {args.n_frames} timesteps, "
              f"{len(dropped)} frames dropped")


if __name__ == "__main__":
    main()
