"""MeshGraphNet-style Encode-Process-Decode GNN in pure JAX.

TPU-native redesign of the reference's torch_geometric stack
(meshnet/graph_network.py:335-408 + InteractionNetwork :114-222): message
passing is gather -> MLP -> ``jax.ops.segment_sum`` instead of PyG scatter
kernels, every MLP is a batched matmul on the MXU, and the 15-layer processor
runs under one jit with static shapes (graphs are padded to fixed node/edge
counts with masks).

Architecture parity:
  * Encoder: node MLP (in -> 128 -> 128 -> 128) + LayerNorm, edge MLP same.
  * Processor: N residual InteractionNetworks; edge update
    MLP([x_target, x_source, e]) with LayerNorm, node update
    MLP([aggregated_messages, x]) with LayerNorm, aggregation = sum at the
    TARGET node (PyG flow='source_to_target', edge_index=[src, dst]).
  * Decoder: MLP (128 -> 128 -> 128 -> out), no LayerNorm.

Parameters are plain pytrees (dicts of (w, b) lists) with PyTorch-Linear
U(-1/sqrt(in), 1/sqrt(in)) init so training dynamics match the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LATENT = 128


# --------------------------------------------------------------------------- #
# MLP
# --------------------------------------------------------------------------- #

def init_linear(rng: np.random.Generator, n_in: int, n_out: int):
    bound = 1.0 / np.sqrt(n_in)
    return {
        "w": jnp.asarray(rng.uniform(-bound, bound, (n_in, n_out)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-bound, bound, (n_out,)), jnp.float32),
    }


def init_mlp(rng: np.random.Generator, sizes: list[int], layer_norm: bool):
    layers = [init_linear(rng, sizes[i], sizes[i + 1]) for i in range(len(sizes) - 1)]
    params = {"layers": layers}
    if layer_norm:
        params["ln_scale"] = jnp.ones((sizes[-1],), jnp.float32)
        params["ln_bias"] = jnp.zeros((sizes[-1],), jnp.float32)
    return params


def apply_mlp(params, x: jnp.ndarray) -> jnp.ndarray:
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    if "ln_scale" in params:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * params["ln_scale"] + params["ln_bias"]
    return x


# --------------------------------------------------------------------------- #
# Encode-Process-Decode
# --------------------------------------------------------------------------- #

def init_encode_process_decode(
    rng: np.random.Generator,
    nnode_in: int,
    nnode_out: int,
    nedge_in: int,
    latent: int = LATENT,
    n_message_passing: int = 15,
    n_mlp_layers: int = 2,
    mlp_hidden: int = LATENT,
):
    hidden = [mlp_hidden] * n_mlp_layers
    return {
        "encoder": {
            "node": init_mlp(rng, [nnode_in] + hidden + [latent], layer_norm=True),
            "edge": init_mlp(rng, [nedge_in] + hidden + [latent], layer_norm=True),
        },
        "processor": [
            {
                "edge": init_mlp(rng, [3 * latent] + hidden + [latent], layer_norm=True),
                "node": init_mlp(rng, [2 * latent] + hidden + [latent], layer_norm=True),
            }
            for _ in range(n_message_passing)
        ],
        "decoder": init_mlp(rng, [latent] + hidden + [nnode_out], layer_norm=False),
    }


def apply_encode_process_decode(
    params,
    node_features: jnp.ndarray,   # [V, nnode_in]
    edge_index: jnp.ndarray,      # [2, E] int32 (src, dst)
    edge_features: jnp.ndarray,   # [E, nedge_in]
    edge_mask: jnp.ndarray | None = None,  # [E] bool, False for padding
) -> jnp.ndarray:
    """Returns per-node outputs [V, nnode_out]."""
    n_nodes = node_features.shape[0]
    src, dst = edge_index[0], edge_index[1]

    x = apply_mlp(params["encoder"]["node"], node_features)
    e = apply_mlp(params["encoder"]["edge"], edge_features)

    for block in params["processor"]:
        # message for edge (j->i): MLP([x_i, x_j, e]) with i = target
        msg_in = jnp.concatenate([x[dst], x[src], e], axis=-1)
        msg = apply_mlp(block["edge"], msg_in)
        if edge_mask is not None:
            msg_agg = jnp.where(edge_mask[:, None], msg, 0.0)
        else:
            msg_agg = msg
        agg = jax.ops.segment_sum(msg_agg, dst, num_segments=n_nodes)
        x_new = apply_mlp(block["node"], jnp.concatenate([agg, x], axis=-1))
        x = x + x_new
        e = e + msg

    return apply_mlp(params["decoder"], x)


# --------------------------------------------------------------------------- #
# Online normalizer (Welford-style accumulation as explicit pytree state)
# --------------------------------------------------------------------------- #

class NormalizerState(NamedTuple):
    """Parity with reference meshnet/model_utils.py:40-96 (stops accumulating
    after max_accumulations; identity when size == 0 arrays are disabled)."""

    acc_sum: jnp.ndarray          # [1, D]
    acc_sum_sq: jnp.ndarray       # [1, D]
    acc_count: jnp.ndarray        # scalar float
    num_accumulations: jnp.ndarray  # scalar float


MAX_ACCUMULATIONS = 1e6
STD_EPSILON = 1e-8


def init_normalizer(size: int) -> NormalizerState:
    return NormalizerState(
        acc_sum=jnp.zeros((1, size), jnp.float32),
        acc_sum_sq=jnp.zeros((1, size), jnp.float32),
        acc_count=jnp.zeros((), jnp.float32),
        num_accumulations=jnp.zeros((), jnp.float32),
    )


def _norm_stats(state: NormalizerState):
    safe = jnp.maximum(state.acc_count, 1.0)
    mean = state.acc_sum / safe
    std = jnp.sqrt(jnp.maximum(state.acc_sum_sq / safe - mean**2, 0.0))
    return mean, jnp.maximum(std, STD_EPSILON)


def normalizer_apply(state: NormalizerState, data: jnp.ndarray,
                     accumulate: bool) -> tuple[jnp.ndarray, NormalizerState]:
    """Normalize; optionally accumulate batch statistics (training mode)."""
    if accumulate:
        do = state.num_accumulations < MAX_ACCUMULATIONS
        count = jnp.asarray(data.shape[0], jnp.float32)
        data_ng = jax.lax.stop_gradient(data)
        state = NormalizerState(
            acc_sum=state.acc_sum + jnp.where(do, jnp.sum(data_ng, 0, keepdims=True), 0.0),
            acc_sum_sq=state.acc_sum_sq
            + jnp.where(do, jnp.sum(data_ng**2, 0, keepdims=True), 0.0),
            acc_count=state.acc_count + jnp.where(do, count, 0.0),
            num_accumulations=state.num_accumulations + jnp.where(do, 1.0, 0.0),
        )
    mean, std = _norm_stats(state)
    return (data - mean) / std, state


def normalizer_inverse(state: NormalizerState, data: jnp.ndarray) -> jnp.ndarray:
    mean, std = _norm_stats(state)
    return data * std + mean


class IdentityNormalizer:
    """Stateless passthrough (reference model_utils.py:16-37)."""

    @staticmethod
    def apply(state, data, accumulate):
        return data, state

    @staticmethod
    def inverse(state, data):
        return data
