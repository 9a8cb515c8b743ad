#!/usr/bin/env python
"""GNN dynamics evaluation in-sim (reference manipulation/
dynamics_evaluation.py parity): autoregressive rollouts against held-out PBD
trajectories, per-step and mean MSE, optional per-trajectory reports."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Evaluate GNN dynamics rollouts")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--meshnet_dir", type=str, required=True)
    p.add_argument("--input_sequence_length", type=int, default=2)
    p.add_argument("--message_passing", type=int, default=15)
    p.add_argument("--num_samples", type=int, default=200)
    p.add_argument("--out", type=str, default="dynamics_eval.json")
    args = p.parse_args(argv)

    import numpy as np

    from cloth_splatting_tpu.data.trajectories import ClothSampleDataset
    from cloth_splatting_tpu.models.cloth_simulator import init_cloth_simulator
    from cloth_splatting_tpu.train.meshnet_train import MeshnetTrainer

    ds = ClothSampleDataset(args.data_path, args.input_sequence_length,
                            1, num_samples=args.num_samples)
    rng = np.random.default_rng(0)
    state = init_cloth_simulator(rng, args.input_sequence_length,
                                 args.message_passing)
    trainer = MeshnetTrainer(input_seq_len=args.input_sequence_length)
    state = trainer.load(args.meshnet_dir, state)

    reports = []
    for i in range(len(ds.trajs)):
        out = trainer.validate_rollout(state, ds.rollout_item(i))
        reports.append({"traj": i, "mean_mse": out["mean_mse"],
                        "per_step_mse": out["per_step_mse"].tolist()})
        print(f"traj {i}: rollout MSE {out['mean_mse']:.6f}")

    mean = float(np.mean([r["mean_mse"] for r in reports]))
    print(f"mean rollout MSE over {len(reports)} trajectories: {mean:.6f}")
    with open(args.out, "w") as f:
        json.dump({"mean_mse": mean, "trajectories": reports}, f, indent=2)


if __name__ == "__main__":
    main()
