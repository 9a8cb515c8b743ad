#!/usr/bin/env python
"""3D tracking alignment + MTE CLI (reference scripts/align_eval_trajs.py
parity): matches each GT point's nearest inferred trajectory at t=0,
rigidly transports the offset with the per-Gaussian rotations, prints the
mean MTE and writes ``<name>_aligned.npz``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--trajs", type=str, required=True,
                   help="all_trajs.npz produced by render.py --log_deform")
    p.add_argument("--gt", type=str, required=True,
                   help="dataset gt.npz with key 'traj' [T, M, 3]")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--scale_mm", type=float, default=1000.0,
                   help="unit -> mm conversion for the printed MTE")
    args = p.parse_args(argv)

    from cloth_splatting_tpu.eval.tracking import evaluate_tracking

    out = args.out or args.trajs.replace(".npz", "_aligned.npz")
    res = evaluate_tracking(args.trajs, args.gt, save_aligned=out)
    print(f"MTE mean: {res['mte_mean'] * args.scale_mm:.3f} mm "
          f"(median {res['mte_median'] * args.scale_mm:.3f} mm, "
          f"{res['n_points']} points x {res['n_times']} times)")
    print(f"aligned trajectories -> {out}")


if __name__ == "__main__":
    main()
