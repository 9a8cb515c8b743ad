#!/usr/bin/env python
"""Demo imitation CLI (reference manipulation/imitation.py parity):
record a scripted half-fold demo on one cloth, then imitate it on a fresh
cloth instance by keypoint correspondence and report the coverage ratio."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Record + imitate fold demos")
    p.add_argument("--mode", choices=["record", "imitate", "both"], default="both")
    p.add_argument("--demo", type=str, default="./demos/halffold/data.h5")
    p.add_argument("--nx", type=int, default=12)
    p.add_argument("--ny", type=int, default=12)
    p.add_argument("--num_samples", type=int, default=50,
                   help="FPS graph subsample size")
    p.add_argument("--n_steps", type=int, default=12)
    p.add_argument("--height", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from cloth_splatting_tpu.manipulation.env import ClothEnv
    from cloth_splatting_tpu.manipulation.imitation import (
        HalfFoldConfig,
        imitate_demo,
        load_demo,
        record_demo,
    )

    config = HalfFoldConfig(height=args.height, n_steps=args.n_steps)
    if args.mode in ("record", "both"):
        env = ClothEnv(nx=args.nx, ny=args.ny, seed=args.seed)
        demo = record_demo(env, config, num_graph_samples=args.num_samples,
                           out_path=args.demo)
        print(f"recorded demo -> {args.demo} "
              f"(coverage {demo['coverage'][0]:.4f} -> {demo['coverage'][-1]:.4f})")
    if args.mode in ("imitate", "both"):
        demo = load_demo(args.demo)
        env = ClothEnv(nx=args.nx, ny=args.ny, seed=args.seed + 1)
        result = imitate_demo(demo, env, height=args.height,
                              n_steps=args.n_steps)
        print(f"imitation coverage {result['coverage']:.4f} "
              f"(demo {result['demo_coverage']:.4f}, "
              f"ratio {result['coverage_ratio']:.3f}, "
              f"graph err {result['graph_error']})")


if __name__ == "__main__":
    main()
