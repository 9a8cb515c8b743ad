#!/usr/bin/env python
"""Extract aligned trajectories + MTE values from *_aligned.npz files into a
flat csv (reference scripts/extract_aligned_trajs.py parity)."""

import argparse
import csv
import glob
import os

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pattern", type=str, required=True,
                   help="glob of *_aligned.npz files")
    p.add_argument("--out", type=str, default="aligned_summary.csv")
    args = p.parse_args(argv)

    rows = []
    for path in sorted(glob.glob(args.pattern)):
        data = np.load(path)
        mte = data["mte"]
        rows.append({
            "file": os.path.basename(path),
            "mte_mean": float(mte.mean()),
            "mte_median": float(np.median(mte)),
            "n_points": int(mte.shape[0]),
        })
        print(f"{path}: MTE {mte.mean():.6f}")

    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["file", "mte_mean", "mte_median",
                                               "n_points"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
