#!/usr/bin/env python
"""Legacy time-conditioned GNN trainer CLI (reference train_meshnet.py parity).

Trains a MeshSimulator that maps (positions, time, node type) -> next
positions on a single npz trajectory (``{'traj': [T, N, 3]}``); rollout mode
predicts positions autoregressively.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Time-conditioned mesh GNN trainer")
    p.add_argument("--mode", choices=["train", "rollout"], default="train")
    p.add_argument("--data_path", type=str, required=True,
                   help="npz file with key 'traj' [T, N, 3]")
    p.add_argument("--model_path", type=str, default="data/model_checkpoint/")
    p.add_argument("--output_path", type=str, default="data/rollouts_pos/")
    p.add_argument("--model_file", type=str, default="latest")
    p.add_argument("--ntraining_steps", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--message_passing", type=int, default=15)
    p.add_argument("--noise_std", type=float, default=0.0)
    p.add_argument("--dt", type=float, default=1.0)
    p.add_argument("--lr_init", type=float, default=3e-4)
    p.add_argument("--lr_decay_rate", type=float, default=0.1)
    p.add_argument("--lr_decay_steps", type=int, default=200)
    p.add_argument("--knn", type=int, default=3)
    p.add_argument("--delaunay", type=int, default=1)
    p.add_argument("--num_samples", type=int, default=300)
    p.add_argument("--subsample", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cloth_splatting_tpu.data.meshing import delaunay_edges, farthest_point_sampling, faces_to_edges
    from cloth_splatting_tpu.models.cloth_simulator import edge_features_from_positions
    from cloth_splatting_tpu.models.time_simulator import (
        init_time_simulator,
        predict_displacement,
        predict_position,
    )
    from cloth_splatting_tpu.utils.checkpoints import (
        latest_checkpoint,
        load_flat,
        restore_like,
        save_pytree,
    )

    traj = np.load(args.data_path, allow_pickle=True)["traj"].astype(np.float32)
    if args.subsample and args.num_samples < traj.shape[1]:
        idx = farthest_point_sampling(traj[0], args.num_samples, seed=args.seed)
        traj = traj[:, idx]
    _, faces = delaunay_edges(traj[0], norm_threshold=None)
    edge_index = jnp.asarray(faces_to_edges(faces.astype(np.int32)))
    t_steps, v, _ = traj.shape
    node_type = jnp.zeros(v, jnp.int32)
    traj_j = jnp.asarray(traj)
    times = jnp.arange(t_steps, dtype=jnp.float32) * args.dt

    rng = np.random.default_rng(args.seed)
    state = init_time_simulator(rng, args.message_passing)
    os.makedirs(args.model_path, exist_ok=True)

    if args.mode == "train":
        tx = optax.scale_by_adam()
        opt_state = tx.init(state["gnn"])

        def lr(epoch):
            return args.lr_init * (args.lr_decay_rate ** (epoch / args.lr_decay_steps)) + 1e-6

        @jax.jit
        def step(state, opt_state, t_ids, noise, lr_val):
            def sample_loss(gnn, t_id, nz):
                st = {**state, "gnn": gnn}
                pos = traj_j[t_id]
                ef = edge_features_from_positions(pos + nz, edge_index)
                tv = jnp.full((v, 1), times[t_id])
                pred, target, _ = predict_displacement(
                    st, pos, tv, node_type, edge_index, ef,
                    target_positions=traj_j[t_id + 1], position_noise=nz)
                return jnp.mean((pred - target) ** 2)

            def batch_loss(gnn):
                return jnp.mean(jax.vmap(lambda t_id, nz: sample_loss(gnn, t_id, nz))(
                    t_ids, noise))

            # accumulate normalizer stats on the first sample of the batch
            pos0 = traj_j[t_ids[0]]
            from cloth_splatting_tpu.models.meshnet import normalizer_apply
            feats0 = jnp.concatenate(
                [pos0 + noise[0], jnp.full((v, 1), times[t_ids[0]]),
                 jnp.ones((v, 1))], -1)
            _, node_norm = normalizer_apply(state["node_norm"], feats0, True)
            _, out_norm = normalizer_apply(
                state["out_norm"], traj_j[t_ids[0] + 1] - (pos0 + noise[0]), True)
            st2 = {**state, "node_norm": node_norm, "out_norm": out_norm}

            loss, grads = jax.value_and_grad(batch_loss)(st2["gnn"])
            updates, opt_state = tx.update(grads, opt_state, st2["gnn"])
            gnn = jax.tree_util.tree_map(lambda pp, u: pp - lr_val * u,
                                         st2["gnn"], updates)
            return {**st2, "gnn": gnn}, opt_state, loss

        key = jax.random.PRNGKey(args.seed)
        for epoch in range(args.ntraining_steps):
            key, k1, k2 = jax.random.split(key, 3)
            t_ids = jax.random.randint(k1, (args.batch_size,), 0, t_steps - 1)
            noise = jax.random.normal(k2, (args.batch_size, v, 3)) * args.noise_std
            state, opt_state, loss = step(state, opt_state, t_ids, noise,
                                          jnp.asarray(lr(epoch), jnp.float32))
            if epoch % 20 == 0:
                print(f"[epoch {epoch}] loss={float(loss):.6f}")
            if epoch % 50 == 0 or epoch == args.ntraining_steps - 1:
                save_pytree(os.path.join(args.model_path, f"model-{epoch}.npz"), state)
        print(f"checkpoints at {args.model_path}")
    else:
        ckpt = (latest_checkpoint(args.model_path) if args.model_file == "latest"
                else os.path.join(args.model_path, args.model_file))
        state = restore_like(state, load_flat(ckpt))
        pos = traj_j[0]
        preds = [np.asarray(pos)]
        for t in range(t_steps - 1):
            ef = edge_features_from_positions(pos, edge_index)
            tv = jnp.full((v, 1), times[t])
            pos = predict_position(state, pos, tv, node_type, edge_index, ef)
            preds.append(np.asarray(pos))
        preds = np.stack(preds)
        mse = float(np.mean((preds - traj) ** 2))
        os.makedirs(args.output_path, exist_ok=True)
        with open(os.path.join(args.output_path, "rollout.pkl"), "wb") as f:
            pickle.dump({"predicted": preds, "ground_truth": traj, "mse": mse}, f)
        print(f"rollout MSE {mse:.6f} -> {args.output_path}/rollout.pkl")


if __name__ == "__main__":
    main()
