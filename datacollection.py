#!/usr/bin/env python
"""Sim trajectory data collection CLI (reference manipulation/
datacollection.py parity): random pick-and-place bezier trajectories in the
PBD cloth simulator, written as per-trajectory h5 directories the GNN
trainer consumes."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Collect cloth sim trajectories")
    p.add_argument("--out", type=str, default="./sim_datasets/train_dataset")
    p.add_argument("--n_trajectories", type=int, default=20)
    p.add_argument("--nx", type=int, default=20)
    p.add_argument("--ny", type=int, default=20)
    p.add_argument("--cloth_size", type=float, default=0.3)
    p.add_argument("--n_steps", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from cloth_splatting_tpu.manipulation.collect import collect_dataset

    out = collect_dataset(args.out, args.n_trajectories, args.nx, args.ny,
                          args.cloth_size, args.n_steps, args.seed)
    print(f"collected {args.n_trajectories} trajectories -> {out}")


if __name__ == "__main__":
    main()
