#!/usr/bin/env python
"""Action-conditioned GNN dynamics training CLI (the paper's dynamics model).

Flag-surface parity with the reference train_meshnet_sim.py:596-666 (absl
flags exposed as argparse): train / valid / rollout modes, curriculum,
message-passing depth, history length, velocity noise, FPS subsampling,
Delaunay meshing, exponential LR decay, periodic checkpoints.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_parser():
    p = argparse.ArgumentParser(description="Cloth GNN dynamics trainer (TPU)")
    p.add_argument("--mode", choices=["train", "valid", "rollout"], default="train")
    p.add_argument("--model_file", type=str, default=None)
    p.add_argument("--data_path", type=str, default="./sim_datasets/train_dataset/TOWEL")
    p.add_argument("--data_val_path", type=str, default="./sim_datasets/test_dataset/TOWEL")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--model_path", type=str, default="data/model_checkpoint_sim/")
    p.add_argument("--output_path", type=str, default="data/rollouts_pos_sim/")
    p.add_argument("--rollout_filename", type=str, default="rollout")
    p.add_argument("--ntraining_steps", type=int, default=300)
    p.add_argument("--nsave_steps", type=int, default=10)
    p.add_argument("--input_sequence_length", type=int, default=2)
    p.add_argument("--future_sequence_length", type=int, default=1)
    p.add_argument("--curriculum", type=int, default=0)
    p.add_argument("--action_steps", type=int, default=1)
    p.add_argument("--message_passing", type=int, default=15)
    p.add_argument("--noise_std", type=float, default=0.0)
    p.add_argument("--dt", type=float, default=1.0)
    p.add_argument("--lr_init", type=float, default=3e-4)
    p.add_argument("--lr_decay_rate", type=float, default=0.1)
    p.add_argument("--lr_decay_steps", type=int, default=300)
    p.add_argument("--normalize", type=int, default=1)
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--delaunay", type=int, default=1)
    p.add_argument("--subsample", type=int, default=1)
    p.add_argument("--num_samples", type=int, default=200)
    p.add_argument("--viz_dir", type=str, default=None,
                   help="write prediction-vs-GT rollout frames + GIF at "
                        "validation epochs (the reference's wandb assets)")
    p.add_argument("--viz_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="1 = shard the sample batch over all JAX devices "
                        "(pure data parallelism; batch_size must divide "
                        "evenly). New TPU-native capability — the reference "
                        "trains single-GPU only (SURVEY.md section 2.3).")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import numpy as np

    from cloth_splatting_tpu.data.trajectories import ClothSampleDataset
    from cloth_splatting_tpu.models.cloth_simulator import init_cloth_simulator
    from cloth_splatting_tpu.train.meshnet_train import MeshnetTrainer, train_meshnet

    rng = np.random.default_rng(args.seed)
    state = init_cloth_simulator(
        rng,
        input_sequence_length=args.input_sequence_length,
        n_message_passing=args.message_passing,
        normalize=bool(args.normalize),
    )
    trainer = MeshnetTrainer(
        lr_init=args.lr_init, lr_decay_rate=args.lr_decay_rate,
        lr_decay_steps=args.lr_decay_steps, noise_std=args.noise_std,
        normalize=bool(args.normalize),
        input_seq_len=args.input_sequence_length,
    )

    exp_name = (f"cloth-splatting-SIM-curr{args.curriculum}-astep{args.action_steps}"
                f"-propagation{args.message_passing}-noise{args.noise_std}"
                f"-nodes{args.num_samples}")
    model_dir = os.path.join(args.model_path, exp_name)

    if args.mode == "train":
        graph_kw = dict(subsample=bool(args.subsample),
                        use_delaunay=bool(args.delaunay), knn=args.knn)
        ds = ClothSampleDataset(args.data_path, args.input_sequence_length,
                                args.future_sequence_length, args.dt,
                                args.num_samples, **graph_kw)
        val_ds = None
        if os.path.isdir(args.data_val_path):
            val_ds = ClothSampleDataset(args.data_val_path,
                                        args.input_sequence_length,
                                        args.future_sequence_length, args.dt,
                                        args.num_samples, **graph_kw)
        print(f"Experiment: {exp_name} | {len(ds.trajs)} trajectories, "
              f"{len(ds)} samples")
        state, losses = train_meshnet(
            trainer, state, ds, val_ds,
            n_epochs=args.ntraining_steps, batch_size=args.batch_size,
            curriculum=bool(args.curriculum),
            base_future=args.future_sequence_length,
            save_every=args.nsave_steps, model_dir=model_dir, seed=args.seed,
            steps_per_epoch=args.steps_per_epoch,
            viz_dir=args.viz_dir, viz_every=args.viz_every,
            data_parallel=bool(args.data_parallel),
        )
        print(f"final loss: {losses[-1]:.6f}; checkpoints at {model_dir}")
    else:
        ds = ClothSampleDataset(args.data_path, args.input_sequence_length,
                                args.future_sequence_length, args.dt,
                                args.num_samples,
                                subsample=bool(args.subsample),
                                use_delaunay=bool(args.delaunay),
                                knn=args.knn)
        state = trainer.load(model_dir, state,
                             args.model_file if args.model_file else "latest")
        os.makedirs(args.output_path, exist_ok=True)
        results = []
        for i in range(len(ds.trajs)):
            out = trainer.validate_rollout(state, ds.rollout_item(i))
            results.append(out)
            print(f"traj {i}: rollout MSE {out['mean_mse']:.6f}")
        with open(os.path.join(args.output_path,
                               f"{args.rollout_filename}.pkl"), "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
