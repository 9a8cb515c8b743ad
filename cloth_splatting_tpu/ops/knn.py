"""Nearest-neighbor distance ops (simple-knn / Open3D replacements).

``mean_knn_sq_dist`` replaces the CUDA ``simple_knn._C.distCUDA2`` used at
Gaussian-init time (reference: scene_reconstruction/gaussian_model.py:134,
gaussian_mesh.py:250): per-point mean **squared** distance to its 3 nearest
neighbors. ``knn`` replaces ``utils/external.py:5-16`` (o3d_knn).

Implementation: brute-force chunked pairwise distances + top_k. At the point
counts this pipeline sees (<= ~2e5, init-time or every-1000-iters only), a
chunked O(N^2) matmul-based distance runs entirely on the MXU and beats any
tree construction on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(points: jnp.ndarray, k: int = 3, chunk: int = 4096):
    """k nearest neighbors (excluding self).

    Args:
        points: [N, 3] float32.
        k: neighbor count.
        chunk: query chunk size (controls peak memory: chunk x N).

    Returns:
        (sq_dists [N, k], indices [N, k]) sorted ascending by distance.
    """
    n = points.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    # Translation invariance: distances only involve differences, but the
    # |q|^2 - 2 q.p + |p|^2 expansion cancels catastrophically when the
    # cloud sits far from the origin. Centering bounds |q.p| by the cloud
    # extent, keeping the f32 cross term accurate at any world offset.
    points = points - jnp.mean(points, axis=0, keepdims=True)
    points = jnp.concatenate(
        [points, jnp.full((n_pad - n, 3), 1e10, dtype=points.dtype)], axis=0
    )
    sq_norms = jnp.sum(points * points, axis=-1)  # [n_pad]

    def one_chunk(start):
        q = jax.lax.dynamic_slice_in_dim(points, start, chunk, axis=0)  # [C, 3]
        qn = jax.lax.dynamic_slice_in_dim(sq_norms, start, chunk, axis=0)
        # ||q - p||^2 = |q|^2 - 2 q.p + |p|^2 (MXU matmul for the cross term).
        # HIGHEST is load-bearing: with the TPU default (bf16 inputs) the
        # cross term carries ~|q||p| * 2^-8 of rounding noise, the same
        # magnitude as true nearest-neighbor d^2 for unit-scale scenes --
        # measured 5% scale-init corruption that capped the parity fit.
        d2 = (qn[:, None]
              - 2.0 * jnp.matmul(q, points.T,
                                 precision=jax.lax.Precision.HIGHEST)
              + sq_norms[None, :])
        # exclude self-matches
        idx = start + jnp.arange(chunk)
        self_mask = idx[:, None] == jnp.arange(n_pad)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        neg_top, top_idx = jax.lax.top_k(-d2, k)
        return -neg_top, top_idx

    starts = jnp.arange(0, n_pad, chunk)
    d2s, idxs = jax.lax.map(one_chunk, starts)
    d2s = d2s.reshape(n_pad, k)[:n]
    idxs = idxs.reshape(n_pad, k)[:n]
    # clamp against padded-point matches (can only occur when n <= k)
    d2s = jnp.where(idxs >= n, jnp.inf, d2s)
    return jnp.maximum(d2s, 0.0), idxs


def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Per-point mean squared distance to the k nearest neighbors.

    Drop-in behavioral equivalent of CUDA ``distCUDA2`` (k=3).
    """
    d2, _ = knn(points, k=k)
    finite = jnp.isfinite(d2)
    d2 = jnp.where(finite, d2, 0.0)
    cnt = jnp.maximum(jnp.sum(finite, axis=-1), 1)
    return jnp.sum(d2, axis=-1) / cnt
