"""Residual mesh deformation model (the in-loop dynamic model of train.py).

A tiny time-conditioned MLP that refines precomputed GNN mesh predictions:
``vertices(t) = mesh_predictions[round(t / dt)] + MLP(sin-enc(t))``.
Behavioral parity with the reference ResidualMeshSimulator
(meshnet/meshnet_network.py:325-379, merge conflict resolved per SURVEY.md:
n_times==1 => dt=1): SinusoidalEncoder(1 input, 6 freqs, identity) -> 13
features -> Linear 256 -> ReLU -> Linear 256 -> ReLU -> Linear V*3 with the
output layer initialized N(0, 1e-5), bias 0.

Implemented as a plain parameter pytree + pure functions (differentiable
inside the jitted train step; three tiny matmuls on the MXU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ResidualSimulatorParams(NamedTuple):
    w_in: jnp.ndarray   # [13, 256]
    b_in: jnp.ndarray   # [256]
    w_h: jnp.ndarray    # [256, 256]
    b_h: jnp.ndarray    # [256]
    w_out: jnp.ndarray  # [256, V*3]
    b_out: jnp.ndarray  # [V*3]


NUM_FREQS = 6
ENC_DIM = 1 + 2 * NUM_FREQS  # identity + (sin, cos) per frequency
HIDDEN = 256


def sinusoidal_encode(t: jnp.ndarray) -> jnp.ndarray:
    """Scalar time -> [13] features: [t, sin(f0 t), cos(f0 t), ..., cos(f5 t)]
    with f_k = 2^k (parity: meshnet_network.py:255-322; cos via sin(x+pi/2))."""
    freqs = 2.0 ** jnp.arange(NUM_FREQS, dtype=jnp.float32)
    angles = t * freqs                                # [6]
    feats = jnp.stack([angles, angles + jnp.pi / 2], axis=-1).reshape(-1)
    return jnp.concatenate([jnp.reshape(t, (1,)), jnp.sin(feats)])


def init_residual_simulator(rng: np.random.Generator, n_nodes: int) -> ResidualSimulatorParams:
    """PyTorch-Linear-style U(-1/sqrt(in), 1/sqrt(in)) init for hidden layers,
    N(0, 1e-5) zero-bias output (parity: meshnet_network.py:352-359)."""

    def linear(n_in, n_out):
        bound = 1.0 / np.sqrt(n_in)
        w = rng.uniform(-bound, bound, size=(n_in, n_out)).astype(np.float32)
        b = rng.uniform(-bound, bound, size=(n_out,)).astype(np.float32)
        return jnp.asarray(w), jnp.asarray(b)

    w_in, b_in = linear(ENC_DIM, HIDDEN)
    w_h, b_h = linear(HIDDEN, HIDDEN)
    w_out = jnp.asarray(rng.normal(0.0, 1e-5, size=(HIDDEN, n_nodes * 3)).astype(np.float32))
    b_out = jnp.zeros((n_nodes * 3,), jnp.float32)
    return ResidualSimulatorParams(w_in, b_in, w_h, b_h, w_out, b_out)


class EmbeddingSimulatorParams(NamedTuple):
    """Per-timestep residual table (the reference's
    ResidualMeshSimulatorEmbedding variant, meshnet_network.py:382-411):
    instead of an MLP over sinusoidal time features, each discrete time id
    owns an independent [V*3] embedding row added to the GNN prediction."""
    embedding: jnp.ndarray  # [T, V*3]


def init_embedding_simulator(rng: np.random.Generator, n_times: int,
                             n_nodes: int) -> EmbeddingSimulatorParams:
    """N(0, 1e-3) init (parity: meshnet_network.py:397)."""
    table = rng.normal(0.0, 1e-3, size=(n_times, n_nodes * 3)).astype(np.float32)
    return EmbeddingSimulatorParams(embedding=jnp.asarray(table))


def simulate_embedding(params: EmbeddingSimulatorParams,
                       mesh_predictions: jnp.ndarray,
                       t: jnp.ndarray) -> jnp.ndarray:
    """Deformed vertices at normalized time t: mesh_predictions[round(t/dt)]
    + embedding[round(t/dt)] (parity: meshnet_network.py:399-407)."""
    n_times = mesh_predictions.shape[0]
    dt = 1.0 if n_times == 1 else 1.0 / (n_times - 1)
    time_id = jnp.clip(jnp.round(t / dt).astype(jnp.int32), 0, n_times - 1)
    residual = jax.lax.dynamic_index_in_dim(
        params.embedding, time_id, axis=0, keepdims=False).reshape(-1, 3)
    base = jax.lax.dynamic_index_in_dim(mesh_predictions, time_id, axis=0,
                                        keepdims=False)
    return base + residual


def simulate_any(params, mesh_predictions: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on the simulator param type (trace-time static): the
    residual MLP (ResidualSimulatorParams) or the per-timestep table
    (EmbeddingSimulatorParams, --simulator embedding)."""
    if isinstance(params, EmbeddingSimulatorParams):
        return simulate_embedding(params, mesh_predictions, t)
    return simulate(params, mesh_predictions, t)


def simulate(params: ResidualSimulatorParams, mesh_predictions: jnp.ndarray,
             t: jnp.ndarray) -> jnp.ndarray:
    """Deformed vertices at normalized time t in [0, 1].

    Args:
        params: MLP parameters.
        mesh_predictions: [T, V, 3] precomputed GNN rollout positions.
        t: scalar normalized time.

    Returns: [V, 3] deformed vertex positions.
    """
    n_times = mesh_predictions.shape[0]
    dt = 1.0 if n_times == 1 else 1.0 / (n_times - 1)
    h = sinusoidal_encode(t)
    # f32 matmuls: the output feeds VERTEX POSITIONS, where bf16 rounding
    # (TPU matmul default) is screen-space noise at high resolutions.
    hp = jax.lax.Precision.HIGHEST
    h = jax.nn.relu(jnp.matmul(h, params.w_in, precision=hp) + params.b_in)
    h = jax.nn.relu(jnp.matmul(h, params.w_h, precision=hp) + params.b_h)
    residual = (jnp.matmul(h, params.w_out, precision=hp)
                + params.b_out).reshape(-1, 3)
    time_id = jnp.clip(jnp.round(t / dt).astype(jnp.int32), 0, n_times - 1)
    base = jax.lax.dynamic_index_in_dim(mesh_predictions, time_id, axis=0, keepdims=False)
    return base + residual
