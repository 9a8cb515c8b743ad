"""GNN dynamics training (the reference's train_meshnet_sim.py train loop).

One jitted multi-step training program per (future length, batch size):
batch vmapped over padded graphs, the future-sequence unroll inlined with
``update_prediction`` state advances, Adam with the reference's exponential
epoch decay ``lr = lr_init * decay^(epoch/decay_steps) + 1e-6``
(train_meshnet_sim.py:552), curriculum 1 -> 2 -> 3 future steps at 1/3 and
2/3 of training (ibid :478-489), velocity noise injected only at the first
unroll step (:503-505).

Normalizer statistics are accumulated once per batch on the flattened
first-step features/targets (outside the vmap) rather than per
predict_acceleration call — same converged statistics, one less lax carry.
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cloth_splatting_tpu.models.cloth_simulator import (
    NODE_TYPES,
    edge_features_from_positions,
    predict_acceleration,
    rollout,
    update_prediction,
)
from cloth_splatting_tpu.models.meshnet import (
    normalizer_apply,
    normalizer_inverse,
)
from cloth_splatting_tpu.utils.checkpoints import latest_checkpoint, load_flat, restore_like, save_pytree


class MeshnetTrainer:
    def __init__(self, lr_init: float = 3e-4, lr_decay_rate: float = 0.1,
                 lr_decay_steps: float = 300.0, noise_std: float = 0.0,
                 normalize: bool = True, input_seq_len: int = 2):
        self.lr_init = lr_init
        self.lr_decay_rate = lr_decay_rate
        self.lr_decay_steps = lr_decay_steps
        self.noise_std = noise_std
        self.normalize = normalize
        self.input_seq_len = input_seq_len
        self.tx = optax.scale_by_adam()

    def lr(self, epoch: float) -> float:
        return self.lr_init * (self.lr_decay_rate ** (epoch / self.lr_decay_steps)) + 1e-6

    def init_opt(self, state: dict):
        return self.tx.init(state["gnn"])

    @functools.partial(jax.jit, static_argnames=("self", "future"))
    def _train_step(self, state: dict, opt_state, batch: dict, key, lr,
                    future: int):
        normalize = self.normalize
        b, v, _ = batch["velocity"].shape

        # first-step noise (reference: only f=0, else it accumulates)
        noise = (jax.random.normal(key, batch["velocity"].shape) * self.noise_std
                 if self.noise_std > 0 else jnp.zeros_like(batch["velocity"]))
        vel0 = batch["velocity"] + noise

        # ---- accumulate normalizer stats on the flattened batch ----
        node_norm, out_norm = state["node_norm"], state["out_norm"]
        if normalize:
            onehot = jax.nn.one_hot(batch["node_type"].astype(jnp.int32), NODE_TYPES)
            feats0 = jnp.concatenate([vel0, onehot], -1).reshape(b * v, -1)
            _, node_norm = normalizer_apply(node_norm, feats0, accumulate=True)
            tacc0 = (batch["target_vel"][:, :, 0] - vel0[..., -3:]).reshape(b * v, 3)
            _, out_norm = normalizer_apply(out_norm, tacc0, accumulate=True)
        state = {**state, "node_norm": node_norm, "out_norm": out_norm}

        def per_sample(gnn_params, vel, node_type, pos, edge_index, edge_mask,
                       target_vel, particle_actions):
            st = {**state, "gnn": gnn_params}
            edge_feats = edge_features_from_positions(pos, edge_index)
            loss = 0.0
            for f in range(future):
                pred, target, _ = predict_acceleration(
                    st, vel, node_type, edge_index, edge_feats,
                    target_velocity=target_vel[:, f], edge_mask=edge_mask,
                    normalize=normalize, training=False,
                )
                loss = loss + jnp.mean((pred - target) ** 2)
                if f < future - 1:
                    acc = (normalizer_inverse(st["out_norm"], pred)
                           if normalize else pred)
                    vel, edge_feats, pos = update_prediction(
                        vel, acc, pos, edge_index,
                        particle_actions[:, f], particle_actions[:, f + 1],
                    )
            return loss

        def batch_loss(gnn_params):
            losses = jax.vmap(
                lambda *args: per_sample(gnn_params, *args)
            )(vel0, batch["node_type"], batch["positions"], batch["edge_index"],
              batch["edge_mask"], batch["target_vel"], batch["particle_actions"])
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(batch_loss)(state["gnn"])
        updates, opt_state = self.tx.update(grads, opt_state, state["gnn"])
        gnn = jax.tree_util.tree_map(lambda p, u: p - lr * u, state["gnn"], updates)
        return {**state, "gnn": gnn}, opt_state, loss

    def train_step(self, state, opt_state, batch: dict[str, np.ndarray], key,
                   epoch: float, future: int):
        batch_j = {k: jnp.asarray(var) for k, var in batch.items()}
        return self._train_step(state, opt_state, batch_j, key,
                                jnp.asarray(self.lr(epoch), jnp.float32), future)

    # ------------------------------------------------------------- rollout

    def validate_rollout(self, state: dict, item: dict[str, np.ndarray],
                         n_steps: int | None = None) -> dict[str, np.ndarray]:
        """Autoregressive rollout vs ground truth; returns predictions and
        per-step MSE (reference validate(), train_meshnet_sim.py:293-320)."""
        t_total = item["pos"].shape[0]
        n = n_steps or (t_total - 1)
        n = min(n, item["actions"].shape[0], t_total - 1)
        traj, vels = rollout(
            state,
            jnp.asarray(item["pos"][0]),
            jnp.asarray(item["init_velocity"]),
            jnp.asarray(item["node_type"]),
            jnp.asarray(item["edge_index"]),
            jnp.asarray(item["actions"]),
            jnp.asarray(item["grasped"]),
            n_steps=n,
            normalize=self.normalize,
        )
        gt = item["pos"][1:n + 1]
        err = np.mean((np.asarray(traj[1:]) - gt) ** 2, axis=(1, 2))
        return {"predicted_positions": np.asarray(traj),
                "ground_truth": item["pos"][:n + 1],
                "per_step_mse": err,
                "mean_mse": float(err.mean())}

    # --------------------------------------------------------- checkpoints

    def save(self, model_dir: str, step: int, state: dict, opt_state=None):
        os.makedirs(model_dir, exist_ok=True)
        save_pytree(os.path.join(model_dir, f"model-{step}.npz"), state)
        if opt_state is not None:
            save_pytree(os.path.join(model_dir, f"train_state-{step}.npz"),
                        {"opt": opt_state, "step": np.asarray(step)})

    def load(self, model_dir: str, template: dict, file: str = "latest") -> dict:
        path = (latest_checkpoint(model_dir) if file == "latest"
                else os.path.join(model_dir, file))
        if path is None or not os.path.exists(path):
            raise FileNotFoundError(f"no meshnet checkpoint in {model_dir}")
        return restore_like(template, load_flat(path))


def train_meshnet(
    trainer: MeshnetTrainer,
    state: dict,
    train_ds,
    val_ds=None,
    n_epochs: int = 300,
    batch_size: int = 32,
    curriculum: bool = True,
    base_future: int = 1,
    save_every: int = 10,
    model_dir: str | None = None,
    seed: int = 0,
    log_every: int = 1,
    steps_per_epoch: int | None = None,
    viz_dir: str | None = None,
    viz_every: int = 50,
    data_parallel: bool = False,
) -> tuple[dict, list[float]]:
    """Epoch loop with the 1/3-2/3 future-length curriculum.

    ``data_parallel=True`` shards the sample batch over ALL devices (pure DP
    — per-sample message passing is independent until the loss/grad reduce;
    parallel/mesh.py make_sharded_meshnet_step) with the GNN/normalizer
    state replicated. Requires batch_size % len(jax.devices()) == 0.
    """
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    opt_state = trainer.init_opt(state)
    losses = []

    dp_steps: dict[int, tuple] = {}
    if data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cloth_splatting_tpu.parallel.mesh import make_mesh, make_sharded_meshnet_step

        dmesh = make_mesh()
        n_dev = dmesh.devices.size
        if batch_size % n_dev:
            raise ValueError(
                f"--data_parallel needs batch_size ({batch_size}) divisible "
                f"by the device count ({n_dev})")
        rep = NamedSharding(dmesh, P())
        state = jax.device_put(state, rep)
        opt_state = jax.device_put(opt_state, rep)
        print(f"meshnet data-parallel over {n_dev} devices")

        def dp_step(future: int):
            if future not in dp_steps:
                dp_steps[future] = make_sharded_meshnet_step(
                    trainer, dmesh, future)
            return dp_steps[future]

    for epoch in range(n_epochs):
        future = base_future
        if curriculum:
            frac = epoch / max(n_epochs, 1)
            future = 1 if frac < 0.33 else (2 if frac < 0.66 else 3)
        if train_ds.future_seq_len != future:
            train_ds.set_future_seq_len(future)

        n_steps = steps_per_epoch or max(len(train_ds) // batch_size, 1)
        epoch_loss = 0.0
        for _ in range(n_steps):
            batch = train_ds.batch(rng, batch_size)
            key, sub = jax.random.split(key)
            if data_parallel:
                step, place_batch = dp_step(future)
                state, opt_state, loss = step(
                    state, opt_state, place_batch(batch), sub,
                    jnp.asarray(trainer.lr(epoch), jnp.float32))
            else:
                state, opt_state, loss = trainer.train_step(
                    state, opt_state, batch, sub, epoch, future)
            epoch_loss += float(loss)
        losses.append(epoch_loss / n_steps)

        if epoch % log_every == 0:
            msg = f"[meshnet epoch {epoch}/{n_epochs}] future={future} loss={losses[-1]:.6f}"
            if val_ds is not None and len(val_ds.trajs) > 0:
                item = val_ds.rollout_item(0)
                val = trainer.validate_rollout(state, item)
                msg += f" val_rollout_mse={val['mean_mse']:.6f}"
                if viz_dir and epoch % viz_every == 0:
                    # rendered prediction-vs-GT rollout frames + GIF, the
                    # reference's wandb validation assets
                    # (train_meshnet_sim.py:534-549) written to disk
                    from cloth_splatting_tpu.eval.mesh_viz import (
                        create_gif,
                        rollout_frames,
                    )

                    frame_dir = os.path.join(viz_dir, f"epoch_{epoch:05d}")
                    paths = rollout_frames(val["ground_truth"],
                                           val["predicted_positions"],
                                           item["edge_index"], frame_dir)
                    if paths:
                        create_gif(paths, os.path.join(
                            frame_dir, "rollout.gif"))
                        msg += f" viz={frame_dir}"
            print(msg)

        if model_dir and epoch % save_every == 0:
            trainer.save(model_dir, epoch, state, opt_state)

    if model_dir:
        trainer.save(model_dir, n_epochs, state, opt_state)
    return state, losses
