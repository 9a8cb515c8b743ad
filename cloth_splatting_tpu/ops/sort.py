"""Sort-free stable counting-rank for bucket keys.

XLA's TPU sort lowers to a deep bitonic network whose fixed cost (~30 ms
regardless of size on the target runtime) dwarfs this pipeline's actual
work. Binning Gaussians only ever sorts small-integer keys (tile ids, depth
buckets), so we replace ``lax.sort`` with a fully-parallel stable counting
sort built from three cheap primitives:

  1. global bucket histogram -> exclusive cumsum = bucket offsets,
  2. per-chunk bucket histograms -> exclusive cumsum across chunks =
     cross-chunk stable base per (chunk, bucket),
  3. within-chunk rank among equal keys via a [C, C] masked equality
     matrix per chunk (pure VPU work, no data-dependent control flow).

``position[i] = offsets[key[i]] + base[chunk(i), key[i]] + rank_in_chunk[i]``
is a stable permutation: equal keys keep their original order. Cost is
O(B * C) elementwise ops + two scatters — microseconds-to-milliseconds where
``lax.sort`` costs tens of milliseconds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _auto_chunk(b: int) -> int:
    """Equality-rank tile size: total cost is B * chunk, so scale the chunk
    with B (power of two in [128, 1024])."""
    c = 128
    while c < 1024 and c * 128 < b:
        c *= 2
    return c


@functools.partial(jax.jit, static_argnames=("n_buckets", "chunk"))
def counting_rank(keys: jnp.ndarray, n_buckets: int,
                  chunk: int | None = None) -> jnp.ndarray:
    """Stable counting-sort positions for int keys in [0, n_buckets).

    Args:
        keys: [B] int32 bucket keys (use n_buckets-1 as a trailing sentinel
            bucket for invalid entries if needed).
        n_buckets: static bucket count.
        chunk: within-chunk equality-rank tile size (cost ~ B * chunk).

    Returns:
        positions [B] int32 — a permutation: element i belongs at
        ``positions[i]`` of the stable bucket-sorted order.
    """
    b = keys.shape[0]
    if chunk is None:
        chunk = _auto_chunk(b)
    b_pad = ((b + chunk - 1) // chunk) * chunk
    keys_p = jnp.concatenate(
        [keys.astype(jnp.int32),
         jnp.full((b_pad - b,), n_buckets - 1, jnp.int32)]
    )
    n_chunks = b_pad // chunk

    # 1. global offsets
    hist = jnp.bincount(keys_p, length=n_buckets)
    offsets = jnp.concatenate([jnp.zeros((1,), hist.dtype), jnp.cumsum(hist)[:-1]])

    # 2. cross-chunk base: exclusive cumsum of per-chunk histograms
    chunk_ids = jnp.arange(b_pad, dtype=jnp.int32) // chunk
    chunk_hist = jnp.bincount(
        chunk_ids * n_buckets + keys_p, length=n_chunks * n_buckets
    ).reshape(n_chunks, n_buckets)
    base = jnp.concatenate(
        [jnp.zeros((1, n_buckets), chunk_hist.dtype),
         jnp.cumsum(chunk_hist, axis=0)[:-1]], axis=0
    )                                                     # [n_chunks, n_buckets]

    # 3. within-chunk stable rank among equal keys (strictly-lower-triangular
    # mask built from iota comparisons: no large constants to ship)
    kc = keys_p.reshape(n_chunks, chunk)
    eq = kc[:, :, None] == kc[:, None, :]                 # [n_chunks, C, C]
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = col < row
    within = jnp.sum(eq & tri[None], axis=2).astype(jnp.int32)

    pos = (offsets[keys_p]
           + base[chunk_ids, keys_p]
           + within.reshape(-1)).astype(jnp.int32)
    return pos[:b]


def rank_permutation(values_bucketed: jnp.ndarray, n_buckets: int,
                     chunk: int | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(rank, inverse) permutations for bucketed values: ``rank[i]`` is i's
    position in sorted order; ``inverse[p]`` is the element at position p."""
    rank = counting_rank(values_bucketed, n_buckets, chunk)
    n = rank.shape[0]
    inverse = jnp.zeros((n,), jnp.int32).at[rank].set(
        jnp.arange(n, dtype=jnp.int32))
    return rank, inverse


def quantize_depth(depth: jnp.ndarray, valid: jnp.ndarray,
                   n_buckets: int) -> jnp.ndarray:
    """Quantize positive depths into [0, n_buckets-1); invalid entries get the
    last (sentinel) bucket so they land after every valid element."""
    big = jnp.where(valid, depth, -jnp.inf)
    small = jnp.where(valid, depth, jnp.inf)
    dmin = jnp.min(small)
    dmax = jnp.max(big)
    span = jnp.maximum(dmax - dmin, 1e-9)
    bucket = jnp.floor((depth - dmin) / span * (n_buckets - 2)).astype(jnp.int32)
    bucket = jnp.clip(bucket, 0, n_buckets - 2)
    return jnp.where(valid, bucket, n_buckets - 1)
