"""Tile-binned differentiable rasterizer (XLA tier) — sort-free.

TPU-native redesign of the CUDA tile rasterizer's algorithm (not a port).
The CUDA version duplicates Gaussians per covered tile and radix-sorts
(tile, depth) keys; XLA's TPU sort is a deep bitonic network with a large
fixed cost, so binning here uses NO sort at all:

  1. Depth ORDER comes from a quantized counting-rank
     (ops/sort.py): 4096 depth buckets, stable chunked equality ranks.
  2. Each depth-ordered Gaussian owns a static ``win x win`` window of
     candidate tile slots over its screen rect (projection caps the radius
     and shrinks the support ellipse so the rect always fits — static
     shapes, no dynamic duplication).
  3. A second counting-rank over instance tile ids yields each instance's
     position in its tile's front-to-back list; ONE scatter materializes a
     dense [tiles, k_cap, 12] parameter grid (xy, conic, rgb, opacity,
     depth, support cutoff) — compositing then reads contiguous chunks with
     zero gathers.
  4. Front-to-back alpha compositing as a checkpointed ``lax.scan`` over
     depth chunks: exclusive in-chunk cumulative products of (1 - alpha),
     one einsum per chunk for color.

Everything is differentiable by autodiff (the scatter's VJP is a gather);
integer binning is non-differentiable by construction, matching the CUDA
semantics. Behavioral contract replicated from the reference's submodule
``depth-diff-gaussian-rasterization`` (call site gaussian_renderer/
__init__.py:156-164): alpha clamp 0.99, 1/255 contribution floor, +0.3 px
low-pass (in projection), returns (rgb [3,H,W], depth [1,H,W] expected
depth, alpha [1,H,W]).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cloth_splatting_tpu.ops.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    MAX_SPLAT_RADIUS,
    ProjectedGaussians,
)
from cloth_splatting_tpu.ops.sort import counting_rank, quantize_depth, rank_permutation

DEPTH_BUCKETS = 4096


class RasterAux(NamedTuple):
    """Diagnostics from binning (not differentiated)."""

    n_dropped: jnp.ndarray       # instances beyond per-tile capacity
    max_tile_count: jnp.ndarray  # deepest per-tile list


class TileBins(NamedTuple):
    """Dense per-tile instance grid ready for compositing."""

    dense: jnp.ndarray   # [n_tiles, k_cap, 12] packed params (empty: opacity 0)
    aux: RasterAux


PACK = 12  # xy(2) conic(3) rgb(3) opacity(1) depth(1) cut(1) pad(1)


def bin_gaussians(proj: ProjectedGaussians, tw: int, th: int, tile_size: int,
                  win: int, k_cap: int) -> TileBins:
    """Depth-order + tile-bin + scatter into the dense compositing grid."""
    n_tiles = tw * th
    n = proj.xy.shape[0]
    slots = win * win

    # ---- depth order without sort ----
    buckets = quantize_depth(proj.depth, proj.valid, DEPTH_BUCKETS)
    _, inverse = rank_permutation(buckets, DEPTH_BUCKETS)
    xy = proj.xy[inverse]
    conic = proj.conic[inverse]
    color = proj.color[inverse]
    opacity = jnp.where(proj.valid[inverse], proj.opacity[inverse], 0.0)
    depth = jnp.where(jnp.isfinite(proj.depth[inverse]), proj.depth[inverse], 0.0)
    valid = proj.valid[inverse]
    power_cut = proj.power_cut[inverse]
    r_bin = proj.radius[inverse]

    # ---- static instance window over the tile rect ----
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r_bin) / tile_size), 0, tw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r_bin) / tile_size), 0, th).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r_bin) / tile_size) + 1, 0, tw).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r_bin) / tile_size) + 1, 0, th).astype(jnp.int32)

    dj = jnp.arange(slots, dtype=jnp.int32)
    tx = x0[:, None] + (dj % win)[None, :]
    ty = y0[:, None] + (dj // win)[None, :]
    in_span = (tx < x1[:, None]) & (ty < y1[:, None]) & valid[:, None]
    tile_id = jnp.where(in_span, ty * tw + tx, n_tiles).reshape(-1)  # [N*slots]

    # ---- per-tile front-to-back positions without sort ----
    pos = counting_rank(tile_id, n_tiles + 1)
    counts = jnp.bincount(tile_id, length=n_tiles + 1)[:n_tiles]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)]
    )
    local = pos - offsets[jnp.minimum(tile_id, n_tiles)].astype(jnp.int32)
    keep = (tile_id < n_tiles) & (local < k_cap)
    scatter_idx = jnp.where(keep, tile_id * k_cap + local, n_tiles * k_cap)

    gauss_of_inst = jnp.arange(n * slots, dtype=jnp.int32) // slots
    rows = jnp.concatenate(
        [
            xy, conic, color, opacity[:, None], depth[:, None],
            power_cut[:, None], jnp.zeros((n, 1), xy.dtype),
        ],
        axis=1,
    )[gauss_of_inst]                                           # [N*slots, 12]

    dense = jnp.zeros((n_tiles * k_cap, PACK), xy.dtype)
    dense = dense.at[scatter_idx].set(rows, mode="drop")
    dense = dense.reshape(n_tiles, k_cap, PACK)

    aux = RasterAux(
        n_dropped=jnp.sum(jnp.maximum(counts - k_cap, 0)),
        max_tile_count=jnp.max(counts),
    )
    return TileBins(dense=dense, aux=aux)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "win", "k_cap", "k_chunk"),
)
def rasterize_tiled(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile_size: int = 16,
    win: int = 5,
    k_cap: int = 512,
    k_chunk: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, RasterAux]:
    """Rasterize projected Gaussians. See module docstring.

    Args:
        proj: output of ``project_gaussians`` (capacity padding folded into
            ``proj.valid``).
        width, height: static image size; multiples of ``tile_size``.
        win: per-Gaussian candidate tile window; must cover
            2 + 2*MAX_SPLAT_RADIUS/tile_size tiles.
        k_cap: per-tile list capacity (front-most k_cap survive; deeper
            instances are occluded in practice since lists are front-to-back).
        k_chunk: compositing chunk length (VMEM working-set knob).
    """
    if width % tile_size or height % tile_size:
        raise ValueError("width/height must be multiples of tile_size")
    min_win = 2 + 2 * int(MAX_SPLAT_RADIUS) // tile_size
    if win < min_win:
        raise ValueError(f"win={win} too small for MAX_SPLAT_RADIUS; need >= {min_win}")
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th

    bins = bin_gaussians(proj, tw, th, tile_size, win, k_cap)
    dense = bins.dense

    # ---- per-tile pixel coordinates ----
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    lx = jnp.arange(tile_size)
    pix_x = ((tile_ids % tw) * tile_size)[:, None] + jnp.tile(lx, tile_size)[None, :]
    pix_y = ((tile_ids // tw) * tile_size)[:, None] + jnp.repeat(lx, tile_size)[None, :]
    pix = jnp.stack([pix_x, pix_y], axis=-1).astype(dense.dtype)   # [T, P, 2]
    p = tile_size * tile_size
    n_steps = k_cap // k_chunk

    @jax.checkpoint
    def step(carry, chunk):
        trans, rgb_acc, dep_acc = carry
        g_xy = chunk[..., 0:2]                                 # [T, kc, 2]
        a = chunk[..., 2:3]
        bco = chunk[..., 3:4]
        c = chunk[..., 4:5]
        g_color = chunk[..., 5:8]                              # [T, kc, 3]
        g_op = chunk[..., 8]                                   # [T, kc]
        g_dep = chunk[..., 9]
        g_cut = chunk[..., 10]

        d = pix[:, None, :, :] - g_xy[:, :, None, :]           # [T, kc, P, 2]
        power = (
            -0.5 * (a * d[..., 0] ** 2 + c * d[..., 1] ** 2) - bco * d[..., 0] * d[..., 1]
        )                                                      # [T, kc, P]
        alpha = jnp.minimum(ALPHA_MAX, g_op[..., None] * jnp.exp(power))
        alpha = jnp.where(
            (power > 0.0) | (power < g_cut[..., None]) | (alpha < ALPHA_MIN),
            0.0,
            alpha,
        )

        one_minus = 1.0 - alpha
        cp = jnp.cumprod(one_minus, axis=1)
        cp_excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        w = trans[:, None, :] * cp_excl * alpha                # [T, kc, P]

        # expanded channel sums instead of batched einsums (ops/smallmat.py)
        rgb_acc = rgb_acc + jnp.stack(
            [jnp.sum(w * g_color[:, :, c, None], axis=1) for c in range(3)], axis=1
        )
        dep_acc = dep_acc + jnp.sum(w * g_dep[..., None], axis=1)
        trans = trans * cp[:, -1, :]
        return (trans, rgb_acc, dep_acc), None

    trans0 = jnp.ones((n_tiles, p), dense.dtype)
    rgb0 = jnp.zeros((n_tiles, 3, p), dense.dtype)
    dep0 = jnp.zeros((n_tiles, p), dense.dtype)
    chunks = dense.reshape(n_tiles, n_steps, k_chunk, PACK).transpose(1, 0, 2, 3)
    (trans, rgb_t, dep_t), _ = jax.lax.scan(step, (trans0, rgb0, dep0), chunks)

    rgb_t = rgb_t + trans[:, None, :] * bg_color[None, :, None]
    acc_t = 1.0 - trans

    def tiles_to_image(tiled, ch):
        img = tiled.reshape(th, tw, ch, tile_size, tile_size)
        return img.transpose(2, 0, 3, 1, 4).reshape(ch, height, width)

    rgb = tiles_to_image(rgb_t, 3)
    dep = tiles_to_image(dep_t[:, None, :], 1)
    acc = tiles_to_image(acc_t[:, None, :], 1)
    return rgb, dep, acc, bins.aux
