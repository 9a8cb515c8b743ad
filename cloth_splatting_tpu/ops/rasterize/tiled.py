"""Tile-binned differentiable rasterizer (XLA tier).

TPU-native redesign of the CUDA tile rasterizer's algorithm (not a port):

  1. One global depth argsort of the Gaussians (XLA sort; TPUs have no
     warp-level radix sort, and at this workload's N a single device-wide
     ``jnp.argsort`` is faster than emulating one).
  2. Static-shape instance expansion: each Gaussian owns a fixed window of
     ``win x win`` candidate tile slots over its screen rect (radius is
     clamped so the rect fits the window; out-of-span slots get a sentinel
     tile id). This replaces the CUDA variant's dynamic per-tile duplication
     with a shape the compiler can tile.
  3. One stable sort of the instance tile ids groups instances into per-tile
     runs that inherit depth order; a scatter builds capacity-``k_cap``
     per-tile gather lists.
  4. Front-to-back alpha compositing as a checkpointed ``lax.scan`` over
     depth chunks: per chunk, an exclusive cumulative product of
     (1 - alpha) gives in-chunk transmittance, one einsum accumulates color.

Everything is differentiable by autodiff (gather -> scatter-add VJPs); the
compositing scan is ``jax.checkpoint``-ed so the backward pass rematerializes
alphas instead of storing [steps, tiles, chunk, 256] residuals.

Behavioral contract replicated from the reference's CUDA submodule
``depth-diff-gaussian-rasterization`` (call site gaussian_renderer/
__init__.py:156-164): front-to-back compositing with alpha clamped to 0.99,
1/255 contribution floor, +0.3 px low-pass (in projection), returns
(rgb [3,H,W], depth [1,H,W], alpha [1,H,W]) where depth is the
alpha-composited expected depth.
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


class RasterAux(NamedTuple):
    """Diagnostics from binning (not differentiated)."""

    n_dropped: jnp.ndarray      # instances beyond per-tile capacity
    max_tile_count: jnp.ndarray  # deepest per-tile list


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
    win: int = 6,
    k_cap: int = 512,
    k_chunk: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, RasterAux]:
    """Rasterize projected Gaussians. See module docstring.

    Args:
        proj: output of ``project_gaussians`` (any capacity padding already
            folded into ``proj.valid``).
        width, height: static image size; must be multiples of ``tile_size``.
        bg_color: [3] background.
        win: per-Gaussian candidate tile window (win*win instance slots).
        k_cap: per-tile list capacity (front-most k_cap survive; deeper
            instances are occluded in practice since compositing is
            front-to-back).
        k_chunk: compositing chunk length (VMEM working-set knob).
    """
    if width % tile_size or height % tile_size:
        raise ValueError("width/height must be multiples of tile_size")
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th
    n = proj.xy.shape[0]
    slots = win * win

    # ---- 1. global depth order -------------------------------------------------
    order = jnp.argsort(proj.depth)              # invalid => depth inf => last
    xy = proj.xy[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = proj.opacity[order]
    depth = jnp.where(jnp.isfinite(proj.depth[order]), proj.depth[order], 0.0)
    valid = proj.valid[order]
    power_cut = proj.power_cut[order]

    # ---- 2. instance expansion -------------------------------------------------
    # The projection stage caps radius at MAX_SPLAT_RADIUS and shrinks the
    # support ellipse (power_cut) to match, so any rect of span
    # 2 + 2*MAX_SPLAT_RADIUS/tile_size tiles is guaranteed to contain the
    # full support. win must cover that span.
    min_win = 2 + 2 * int(MAX_SPLAT_RADIUS) // tile_size
    if win < min_win:
        raise ValueError(f"win={win} too small for MAX_SPLAT_RADIUS; need >= {min_win}")
    r_bin = proj.radius[order]
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r_bin) / tile_size), 0, tw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r_bin) / tile_size), 0, th).astype(jnp.int32)
    # exclusive upper tiles: last pixel possibly inside the support is
    # floor(center + r), whose tile is floor((center + r) / ts).
    x1 = jnp.clip(
        jnp.floor((xy[:, 0] + r_bin) / tile_size) + 1, 0, tw
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((xy[:, 1] + r_bin) / tile_size) + 1, 0, th
    ).astype(jnp.int32)

    dj = jnp.arange(slots, dtype=jnp.int32)
    dx = (dj % win)[None, :]
    dy = (dj // win)[None, :]
    tx = x0[:, None] + dx                        # [N, slots]
    ty = y0[:, None] + dy
    in_span = (tx < x1[:, None]) & (ty < y1[:, None]) & valid[:, None]
    tile_id = jnp.where(in_span, ty * tw + tx, n_tiles)  # sentinel = n_tiles
    tile_id = tile_id.reshape(-1)                # [N * slots], depth-major order

    # ---- 3. group instances by tile (stable => keeps depth order) --------------
    perm = jnp.argsort(tile_id, stable=True)
    sorted_tile = tile_id[perm]
    inst_gauss = (jnp.arange(n * slots, dtype=jnp.int32) // slots)[perm]

    counts = jnp.bincount(sorted_tile, length=n_tiles + 1)[:n_tiles]
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    pos = jnp.arange(n * slots, dtype=jnp.int32) - offsets[
        jnp.clip(sorted_tile, 0, n_tiles - 1)
    ].astype(jnp.int32)
    keep = (sorted_tile < n_tiles) & (pos < k_cap)
    scat_tile = jnp.where(keep, sorted_tile, n_tiles)    # dropped via mode="drop"
    scat_pos = jnp.where(keep, pos, k_cap)
    lists = jnp.full((n_tiles, k_cap), -1, dtype=jnp.int32)
    lists = lists.at[scat_tile, scat_pos].set(inst_gauss, mode="drop")

    aux = RasterAux(
        n_dropped=jnp.sum(jnp.maximum(counts - k_cap, 0)),
        max_tile_count=jnp.max(counts),
    )

    # ---- 4. front-to-back compositing ------------------------------------------
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_ox = (tile_ids % tw) * tile_size
    tile_oy = (tile_ids // tw) * tile_size
    lx = jnp.arange(tile_size)
    pix_x = tile_ox[:, None] + jnp.tile(lx, tile_size)[None, :]          # [T, 256]
    pix_y = tile_oy[:, None] + jnp.repeat(lx, tile_size)[None, :]
    pix = jnp.stack([pix_x, pix_y], axis=-1).astype(xy.dtype)            # [T, 256, 2]

    p = tile_size * tile_size
    n_steps = k_cap // k_chunk

    @jax.checkpoint
    def step(carry, ids):
        trans, rgb_acc, dep_acc = carry
        gmask = ids >= 0                                         # [T, kc]
        safe = jnp.maximum(ids, 0)
        g_xy = xy[safe]                                          # [T, kc, 2]
        g_conic = conic[safe]                                    # [T, kc, 3]
        g_color = color[safe]                                    # [T, kc, 3]
        g_op = opacity[safe]                                     # [T, kc]
        g_dep = depth[safe]                                      # [T, kc]
        g_cut = power_cut[safe]                                  # [T, kc]

        d = pix[:, None, :, :] - g_xy[:, :, None, :]             # [T, kc, 256, 2]
        a = g_conic[..., 0:1]
        b = g_conic[..., 1:2]
        c = g_conic[..., 2:3]
        power = (
            -0.5 * (a * d[..., 0] ** 2 + c * d[..., 1] ** 2) - b * d[..., 0] * d[..., 1]
        )                                                        # [T, kc, 256]
        alpha = jnp.minimum(ALPHA_MAX, g_op[..., None] * jnp.exp(power))
        alpha = jnp.where(
            (power > 0.0) | (power < g_cut[..., None]) | (alpha < ALPHA_MIN)
            | (~gmask[..., None]),
            0.0,
            alpha,
        )

        one_minus = 1.0 - alpha
        # exclusive in-chunk transmittance
        cp = jnp.cumprod(one_minus, axis=1)
        cp_excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        w = trans[:, None, :] * cp_excl * alpha                  # [T, kc, 256]

        rgb_acc = rgb_acc + jnp.einsum("tkp,tkc->tcp", w, g_color)
        dep_acc = dep_acc + jnp.einsum("tkp,tk->tp", w, g_dep)
        trans = trans * cp[:, -1, :]
        return (trans, rgb_acc, dep_acc), None

    trans0 = jnp.ones((n_tiles, p), dtype=xy.dtype)
    rgb0 = jnp.zeros((n_tiles, 3, p), dtype=xy.dtype)
    dep0 = jnp.zeros((n_tiles, p), dtype=xy.dtype)
    ids_steps = lists.reshape(n_tiles, n_steps, k_chunk).transpose(1, 0, 2)
    (trans, rgb_t, dep_t), _ = jax.lax.scan(step, (trans0, rgb0, dep0), ids_steps)

    rgb_t = rgb_t + trans[:, None, :] * bg_color[None, :, None]
    acc_t = 1.0 - trans

    def tiles_to_image(tiled, ch):
        # [T, ch, 256] -> [ch, H, W]
        img = tiled.reshape(th, tw, ch, tile_size, tile_size)
        img = img.transpose(2, 0, 3, 1, 4).reshape(ch, height, width)
        return img

    rgb = tiles_to_image(rgb_t, 3)
    dep = tiles_to_image(dep_t[:, None, :], 1)
    acc = tiles_to_image(acc_t[:, None, :], 1)
    return rgb, dep, acc, aux
