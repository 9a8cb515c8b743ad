"""Device-mesh parallelism for splat training and GNN training.

The reference is strictly single-GPU (SURVEY.md section 2.3: no DP/TP/PP/SP
or distributed backend anywhere); this layer is NEW capability designed
TPU-first: a 2-axis ``jax.sharding.Mesh``

  * ``data``  — camera-batch data parallelism (the 3 consecutive-time
    cameras of a step are embarrassingly parallel until the loss reduce),
  * ``model`` — Gaussian-capacity sharding: per-Gaussian work (SH eval,
    covariance, EWA projection, barycentric gathers, Adam state) is sharded
    along the capacity axis; XLA inserts the all-gather feeding the
    per-camera tile compositor and the reduce-scatter on the backward pass.

Following the standard JAX recipe, we ANNOTATE shardings on the jit and let
GSPMD place the collectives on ICI — no hand-written NCCL-style transport.
Single-chip is the degenerate 1x1 mesh: the unsharded paths never pay for
this module.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None) -> Mesh:
    """A (data, model) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = 1
        for cand in (3, 2):
            if n % cand == 0:
                data = cand
                break
    model = n // data
    dev_grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_grid, axis_names=("data", "model"))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Per-Gaussian arrays: shard the capacity (leading) axis over 'model'."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cam_sharding(mesh: Mesh) -> NamedSharding:
    """Camera-batch arrays: shard the batch (leading) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_splat_state(state: Any, mesh: Mesh) -> Any:
    """Place a SplatTrainState on the mesh: all capacity-leading arrays
    sharded over 'model', everything else replicated."""
    cap = state.params.face_bary.shape[0]
    gs = gauss_sharding(mesh)
    rep = replicated(mesh)

    def place(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return jax.device_put(leaf, gs)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map(place, state)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over 'data'."""
    cs = cam_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), cs), tree)


def make_sharded_splat_step(trainer, mesh: Mesh, sh_degree: int, static: bool):
    """A jitted splat train step with explicit sharding annotations.

    The camera batch is sharded over 'data'; the Gaussian state over 'model'
    (via the layout established by shard_splat_state — jit infers from input
    shardings and GSPMD propagates)."""

    def step(state, cams, gt_images):
        return trainer._step_inner(state, cams, gt_images, None, sh_degree,
                                   static, False)

    return jax.jit(step, static_argnums=())


def make_sharded_meshnet_step(trainer, mesh: Mesh, future: int):
    """GNN train step with the batch sharded over the whole mesh (pure DP:
    per-sample message passing is independent until the loss/grad psum)."""
    flat = NamedSharding(mesh, P(("data", "model")))

    def place_batch(batch):
        return {k: jax.device_put(jnp.asarray(v), flat) for k, v in batch.items()}

    def step(state, opt_state, batch, key, lr):
        return trainer._train_step(state, opt_state, batch, key, lr, future)

    return jax.jit(step), place_batch
