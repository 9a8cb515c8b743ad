"""Action-conditioned cloth dynamics simulator (the paper's GNN model).

Behavioral parity with the reference ClothMeshSimulator
(meshnet/cloth_network.py:13-193) and its training/rollout semantics
(train_meshnet_sim.py:92-359,478-554):

  * node features = velocity history [V, 3*hist] (the grasped node's last-3
    components overwritten by the action-induced velocity) ++ one-hot node
    type (cloth=0, grasped=1),
  * edge features = [pos_dst - pos_src (3), ||.|| (1)],
  * the GNN predicts per-node ACCELERATION; target = target_vel - vel[:, -3:]
    (of the noised velocity during training),
  * optional accumulating normalizers on node features and outputs,
  * rollout integrates vel += acc; pos += vel with the grasped node's
    velocity overridden by the action each step.

All functions are pure: normalizer state threads through explicitly, so the
whole multi-step unrolled training objective jits into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.models.meshnet import (
    apply_encode_process_decode,
    init_encode_process_decode,
    init_normalizer,
    normalizer_apply,
    normalizer_inverse,
)

NODE_TYPES = 2  # cloth, grasped


def init_cloth_simulator(rng: np.random.Generator, input_sequence_length: int = 2,
                         n_message_passing: int = 15, latent: int = 128,
                         normalize: bool = True) -> dict:
    """Returns a state dict {gnn, node_norm, out_norm}; ``normalize`` is
    carried by the caller as a static flag."""
    nnode_in = NODE_TYPES + 3 * input_sequence_length
    return {
        "gnn": init_encode_process_decode(
            rng, nnode_in=nnode_in, nnode_out=3, nedge_in=4, latent=latent,
            n_message_passing=n_message_passing, n_mlp_layers=2, mlp_hidden=latent,
        ),
        "node_norm": init_normalizer(nnode_in),
        "out_norm": init_normalizer(3),
    }


def edge_features_from_positions(pos: jnp.ndarray, edge_index: jnp.ndarray):
    """[E, 4] = [pos_dst - pos_src, norm] (T.Cartesian(norm=False) +
    T.Distance(norm=False) semantics, train_meshnet_sim.py:31)."""
    disp = pos[edge_index[1]] - pos[edge_index[0]]
    norm = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    return jnp.concatenate([disp, norm], axis=-1)


def _node_features(velocity, node_type_onehot):
    return jnp.concatenate([velocity, node_type_onehot], axis=-1)


def predict_acceleration(
    state: dict,
    velocity: jnp.ndarray,          # [V, 3*hist]
    node_type: jnp.ndarray,         # [V] int
    edge_index: jnp.ndarray,        # [2, E]
    edge_features: jnp.ndarray,     # [E, 4]
    target_velocity: jnp.ndarray | None = None,   # [V, 3]
    velocity_noise: jnp.ndarray | None = None,
    edge_mask: jnp.ndarray | None = None,
    normalize: bool = True,
    training: bool = False,
):
    """Returns (pred_acc_normalized, target_acc_normalized | None, new_state)."""
    vel = velocity if velocity_noise is None else velocity + velocity_noise
    onehot = jax.nn.one_hot(node_type.astype(jnp.int32), NODE_TYPES)
    feats = _node_features(vel, onehot)

    node_norm = state["node_norm"]
    if normalize:
        feats, node_norm = normalizer_apply(node_norm, feats, accumulate=training)

    pred = apply_encode_process_decode(state["gnn"], feats, edge_index,
                                       edge_features, edge_mask)

    out_norm = state["out_norm"]
    target_norm = None
    if target_velocity is not None:
        target_acc = target_velocity - vel[:, -3:]
        if normalize:
            target_norm, out_norm = normalizer_apply(out_norm, target_acc,
                                                     accumulate=training)
        else:
            target_norm = target_acc

    new_state = {**state, "node_norm": node_norm, "out_norm": out_norm}
    return pred, target_norm, new_state


def predict_velocity(state: dict, velocity, node_type, edge_index, edge_features,
                     edge_mask=None, normalize: bool = True):
    """Rollout-mode prediction: next absolute velocity [V, 3]."""
    pred, _, _ = predict_acceleration(
        state, velocity, node_type, edge_index, edge_features,
        normalize=normalize, training=False,
    )
    acc = normalizer_inverse(state["out_norm"], pred) if normalize else pred
    return velocity[:, -3:] + acc


def update_prediction(velocity, pred_acc_unnorm, position, edge_index,
                      old_particle_actions, particle_actions):
    """Advance the unrolled-training state one step
    (parity: train_meshnet_sim.py:322-359).

    Args:
        velocity: [V, 3*hist] current (noised) history.
        pred_acc_unnorm: [V, 3] unnormalized predicted acceleration.
        position: [V, 3].
        old_particle_actions / particle_actions: [V, 3] action displacement of
            the grasped node at the current / next step (zero elsewhere).
    Returns (velocity, edge_features, position).
    """
    new_vel = velocity[:, -3:] + pred_acc_unnorm
    # grasped node's velocity is known: the commanded action
    new_vel = jnp.where(old_particle_actions != 0, old_particle_actions, new_vel)

    # free nodes integrate; grasped nodes move by the (next) action
    new_pos = jnp.where(particle_actions == 0, position + new_vel, position)
    new_pos = new_pos + particle_actions

    edge_features = edge_features_from_positions(new_pos, edge_index)

    # shift history, append the known/commanded velocity
    appended = jnp.where(particle_actions != 0, particle_actions, velocity[:, -3:])
    velocity = jnp.concatenate([velocity[:, 3:], appended], axis=-1)
    return velocity, edge_features, new_pos


def edge_length_refine(velocity: jnp.ndarray, positions: jnp.ndarray,
                       edge_index: jnp.ndarray, rest_lengths: jnp.ndarray,
                       grasped: jnp.ndarray, n_steps: int = 10,
                       lr: float = 1e-3,
                       edge_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Edge-length-preserving inner optimization for real-world rollouts
    (reference train_meshnet_sim.py:212-250): 10 Adam steps on the predicted
    velocities minimizing sum((|edge after| - rest)^2).

    The reference indexes the per-EDGE deviation vector with the grasped
    PARTICLE index (`length_deviation[grasped_particle] *= 0`) — an indexing
    bug that zeroes one arbitrary edge; here the intended semantics is
    implemented: edges incident to the grasped particle are excluded.
    """
    free = ~((edge_index[0] == grasped) | (edge_index[1] == grasped))
    if edge_mask is not None:
        free = free & edge_mask

    def loss_fn(vel):
        p = positions + vel
        d = p[edge_index[0]] - p[edge_index[1]]
        lengths = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-20)
        dev = jnp.where(free, lengths - rest_lengths, 0.0)
        return jnp.sum(dev ** 2)

    # inline Adam (b1=0.9, b2=0.999, eps=1e-8 — torch.optim.Adam defaults)
    def body(i, carry):
        vel, m, v = carry
        g = jax.grad(loss_fn)(vel)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        t = i + 1.0
        mhat = m / (1.0 - 0.9 ** t)
        vhat = v / (1.0 - 0.999 ** t)
        vel = vel - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return (vel, m, v)

    vel, _, _ = jax.lax.fori_loop(
        0, n_steps, body,
        (velocity, jnp.zeros_like(velocity), jnp.zeros_like(velocity)))
    return vel


def rollout(
    state: dict,
    positions0: jnp.ndarray,        # [V, 3]
    init_velocity: jnp.ndarray,     # [hist, V, 3]
    node_type: jnp.ndarray,         # [V]
    edge_index: jnp.ndarray,        # [2, E]
    actions: jnp.ndarray,           # [S, 3] per-step action of the grasped node
    grasped: jnp.ndarray,           # scalar int index
    n_steps: int,
    edge_mask: jnp.ndarray | None = None,
    normalize: bool = True,
    real_world: bool = False,
    rest_lengths: jnp.ndarray | None = None,
    refine_steps: int = 10,
    refine_lr: float = 1e-3,
):
    """Autoregressive rollout (parity: train_meshnet_sim.py:92-266).

    With ``real_world=True`` each predicted velocity is refined by the
    edge-length-preserving inner optimization before integration (reference
    :212-250); ``rest_lengths`` defaults to the t=0 edge lengths.

    Returns (positions [S+1, V, 3], velocities [S, V, 3]).
    """
    hist = init_velocity.shape[0]
    v0 = jnp.concatenate([init_velocity[i] for i in range(hist)], axis=-1)  # [V, 3h]

    if real_world and rest_lengths is None:
        d0 = positions0[edge_index[0]] - positions0[edge_index[1]]
        rest_lengths = jnp.sqrt(jnp.sum(d0 * d0, axis=-1) + 1e-20)

    def step(carry, action):
        pos, vel_hist = carry
        # graph-building parity (_data_to_graph, dataloader_sim.py:352-412):
        # the grasped node's position is advanced by the action and its
        # latest history slot carries the action-induced velocity.
        grasp_onehot = jax.nn.one_hot(grasped, pos.shape[0])[:, None]      # [V,1]
        pos_in = pos + grasp_onehot * action[None, :]
        vel_in = vel_hist.at[grasped, -3:].set(action)
        edge_feats = edge_features_from_positions(pos_in, edge_index)

        next_vel = predict_velocity(state, vel_in, node_type, edge_index,
                                    edge_feats, edge_mask, normalize)
        if real_world:
            next_vel = edge_length_refine(next_vel, pos, edge_index,
                                          rest_lengths, grasped,
                                          n_steps=refine_steps, lr=refine_lr,
                                          edge_mask=edge_mask)
        next_vel = next_vel.at[grasped].set(action)

        new_pos = pos + next_vel
        new_hist = jnp.concatenate([vel_hist[:, 3:], next_vel], axis=-1)
        return (new_pos, new_hist), (new_pos, next_vel)

    (_, _), (traj, vels) = jax.lax.scan(step, (positions0, v0), actions[:n_steps])
    traj = jnp.concatenate([positions0[None], traj], axis=0)
    return traj, vels
