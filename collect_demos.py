#!/usr/bin/env python
"""Scripted fold demonstrations (reference manipulation/collect_demos.py
parity): deterministic corner-to-corner / half folds for TOWEL and SHORTS
configurations, written as h5 trajectory directories."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FOLDS = {
    "TOWEL": [(0, 3), (1, 2)],          # corner k -> corner opposite
    "SHORTS": [(0, 1), (3, 2)],
    "TSHIRT": [(0, 2), (1, 3)],
}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Collect scripted fold demos")
    p.add_argument("--out", type=str, default="./sim_datasets/demos")
    p.add_argument("--cloth", choices=sorted(FOLDS), default="TOWEL")
    p.add_argument("--n_demos", type=int, default=4)
    p.add_argument("--nx", type=int, default=16)
    p.add_argument("--ny", type=int, default=16)
    p.add_argument("--n_steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import numpy as np

    from cloth_splatting_tpu.manipulation.collect import run_pick_place, write_trajectory_h5
    from cloth_splatting_tpu.manipulation.sim import make_cloth, settle
    from cloth_splatting_tpu.manipulation.trajectory_gen import bezier_actions

    rng = np.random.default_rng(args.seed)
    env_dir = os.path.join(args.out, args.cloth)
    folds = FOLDS[args.cloth]
    for i in range(args.n_demos):
        state, cons, (gx, gy) = make_cloth(args.nx, args.ny, height=0.0)
        state = settle(state, cons, n_steps=10)
        corners = [0, gy - 1, (gx - 1) * gy, gx * gy - 1]
        src_k, dst_k = folds[i % len(folds)]
        pick_idx = corners[src_k]
        pick = np.asarray(state.pos[pick_idx])
        place = np.asarray(state.pos[corners[dst_k]]) \
            + rng.normal(0, 0.005, 3) * np.asarray([1.0, 0.0, 1.0])
        actions = bezier_actions(pick, place,
                                 0.15 * np.linalg.norm(place - pick) + 0.03,
                                 args.n_steps)
        pos, vel, gripper, _ = run_pick_place(state, cons, pick_idx, actions)
        write_trajectory_h5(os.path.join(env_dir, f"demo_{i:04d}"),
                            pos, vel, actions, gripper, pick, place)
        print(f"demo {i}: {args.cloth} fold corner {src_k}->{dst_k}")
    print(f"-> {env_dir}")


if __name__ == "__main__":
    main()
