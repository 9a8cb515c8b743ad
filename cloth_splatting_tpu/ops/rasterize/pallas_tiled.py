"""Pallas per-tile compositing kernel (serving/benchmark tier).

The XLA tier composites a dense [tiles, k_cap] grid — every tile pays for
k_cap slots even when its list holds 3 Gaussians. This kernel walks each
tile's REAL instance list with a dynamic trip count (scalar-prefetched
start/count), double-buffers chunk DMAs from HBM, and early-exits once the
tile's transmittance is saturated — so the work is proportional to the true
(incidence x pixel) count, the quantity the CUDA rasterizer's per-tile warps
exploit (SURVEY.md section 2.1).

Layout: binning (ops/rasterize/tiled.py bin + ops/sort.py counting ranks)
produces a COMPACT instance array [B, 16] f32 whose rows are grouped by tile
in front-to-back depth order. Each grid step owns one 16x16 tile; pixels live
as (2, 128) f32 lanes; per-Gaussian parameters broadcast from VMEM scalars.

Forward-only: training uses the differentiable XLA tier; rendering/serving
uses this one. Outputs match the XLA tier bit-for-bit up to fp reassociation
(tested against the oracle in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cloth_splatting_tpu.ops.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    ProjectedGaussians,
)
from cloth_splatting_tpu.ops.rasterize.tiled import RasterAux
from cloth_splatting_tpu.ops.sort import counting_rank, quantize_depth, rank_permutation

PACK16 = 16      # instance row: xy(2) conic(3) rgb(3) opacity depth cut pad(5)
PACK_PER_ROW = 8  # instances per 128-float row (Mosaic lane alignment)
CHUNK = 32       # instances per DMA (CHUNK/PACK_PER_ROW rows)
TRANS_EPS = 1e-4


def pack_instances(proj: ProjectedGaussians, tw: int, th: int, tile_size: int,
                   win: int):
    """Compact, tile-grouped, depth-ordered instance rows.

    Returns (inst [B_pad, 16] f32, start [T] i32, count [T] i32, aux).
    """
    n_tiles = tw * th
    n = proj.xy.shape[0]
    slots = win * win

    buckets = quantize_depth(proj.depth, proj.valid, 4096)
    _, inverse = rank_permutation(buckets, 4096)
    xy = proj.xy[inverse]
    conic = proj.conic[inverse]
    color = proj.color[inverse]
    opacity = jnp.where(proj.valid[inverse], proj.opacity[inverse], 0.0)
    depth = jnp.where(jnp.isfinite(proj.depth[inverse]), proj.depth[inverse], 0.0)
    valid = proj.valid[inverse]
    power_cut = proj.power_cut[inverse]
    r = proj.radius[inverse]

    x0 = jnp.clip(jnp.floor((xy[:, 0] - r) / tile_size), 0, tw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r) / tile_size), 0, th).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r) / tile_size) + 1, 0, tw).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r) / tile_size) + 1, 0, th).astype(jnp.int32)

    dj = jnp.arange(slots, dtype=jnp.int32)
    tx = x0[:, None] + (dj % win)[None, :]
    ty = y0[:, None] + (dj // win)[None, :]
    in_span = (tx < x1[:, None]) & (ty < y1[:, None]) & valid[:, None]
    tile_id = jnp.where(in_span, ty * tw + tx, n_tiles).reshape(-1)

    pos = counting_rank(tile_id, n_tiles + 1)
    counts_all = jnp.bincount(tile_id, length=n_tiles + 1)
    counts = counts_all[:n_tiles].astype(jnp.int32)
    # unaligned per-tile offsets (positions of counting_rank)
    un_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    # Mosaic DMA slices must be 128-lane aligned; we pack PACK_PER_ROW
    # instances (16 floats each) per 128-float row and align every tile's
    # segment start to a row boundary.
    aligned_counts = ((counts + PACK_PER_ROW - 1) // PACK_PER_ROW) * PACK_PER_ROW
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(aligned_counts)[:-1].astype(jnp.int32)]
    )

    b = n * slots
    b_pad = b + n_tiles * PACK_PER_ROW + 2 * CHUNK
    b_pad = ((b_pad + 127) // 128) * 128
    local = pos - un_starts[jnp.minimum(tile_id, n_tiles)]
    keep = tile_id < n_tiles
    aligned_pos = jnp.where(
        keep, starts[jnp.minimum(tile_id, n_tiles - 1)] + local, b_pad)

    gauss_of_inst = jnp.arange(b, dtype=jnp.int32) // slots
    rows = jnp.concatenate(
        [
            xy, conic, color, opacity[:, None], depth[:, None],
            power_cut[:, None], jnp.zeros((n, PACK16 - 11), xy.dtype),
        ],
        axis=1,
    )[gauss_of_inst]
    inst = jnp.zeros((b_pad, PACK16), xy.dtype)
    inst = inst.at[aligned_pos].set(rows, mode="drop")
    inst = inst.reshape(b_pad // PACK_PER_ROW, PACK_PER_ROW * PACK16)

    aux = RasterAux(n_dropped=jnp.zeros((), jnp.int32),
                    max_tile_count=jnp.max(counts))
    return inst, starts, counts, aux


def _kernel(tile_size: int, tw: int, bg: tuple[float, float, float]):
    p = tile_size * tile_size
    rows, lanes = p // 128, 128

    def kernel(start_ref, count_ref, inst_hbm, rgb_ref, dep_ref, acc_ref,
               buf, sem):
        i = pl.program_id(0)
        ox = (i % tw) * tile_size
        oy = (i // tw) * tile_size
        idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes
               + jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1))
        px = (ox + idx % tile_size).astype(jnp.float32)
        py = (oy + idx // tile_size).astype(jnp.float32)

        start = start_ref[i]
        count = count_ref[i]
        n_chunks = (count + CHUNK - 1) // CHUNK

        rows_per_chunk = CHUNK // PACK_PER_ROW

        def get_dma(slot, chunk_idx):
            row0 = (start + chunk_idx * CHUNK) // PACK_PER_ROW
            return pltpu.make_async_copy(
                inst_hbm.at[pl.ds(row0, rows_per_chunk), :],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(state):
            ci, trans, r0, r1, r2, dep = state

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma((ci + 1) % 2, ci + 1).start()

            get_dma(ci % 2, ci).wait()
            slot = ci % 2
            remaining = count - ci * CHUNK

            def gauss_body(g, inner):
                trans, r0, r1, r2, dep = inner
                row = g // PACK_PER_ROW
                off = (g % PACK_PER_ROW) * PACK16
                gx = buf[slot, row, off]
                gy = buf[slot, row, off + 1]
                ca = buf[slot, row, off + 2]
                cb = buf[slot, row, off + 3]
                cc = buf[slot, row, off + 4]
                col0 = buf[slot, row, off + 5]
                col1 = buf[slot, row, off + 6]
                col2 = buf[slot, row, off + 7]
                op = buf[slot, row, off + 8]
                gd = buf[slot, row, off + 9]
                cut = buf[slot, row, off + 10]
                dx = px - gx
                dy = py - gy
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                alpha = jnp.where(
                    (power > 0.0) | (power < cut) | (alpha < ALPHA_MIN),
                    0.0, alpha)
                live = g < remaining
                alpha = jnp.where(live, alpha, 0.0)
                w = trans * alpha
                return (trans * (1.0 - alpha), r0 + w * col0, r1 + w * col1,
                        r2 + w * col2, dep + w * gd)

            inner = jax.lax.fori_loop(0, CHUNK, gauss_body,
                                      (trans, r0, r1, r2, dep))
            trans, r0, r1, r2, dep = inner
            return (ci + 1, trans, r0, r1, r2, dep)

        def chunk_cond(state):
            ci, trans = state[0], state[1]
            return (ci < n_chunks) & (jnp.max(trans) > TRANS_EPS)

        ones = jnp.ones((rows, lanes), jnp.float32)
        zeros = jnp.zeros((rows, lanes), jnp.float32)
        ci_end, trans, r0, r1, r2, dep = jax.lax.while_loop(
            chunk_cond, chunk_body, (0, ones, zeros, zeros, zeros, zeros))

        # Early transmittance exit can leave the prefetched chunk's DMA in
        # flight; drain it so the next grid step's semaphores start clean.
        @pl.when((ci_end < n_chunks) & (n_chunks > 0))
        def _():
            get_dma(ci_end % 2, ci_end).wait()

        rgb_ref[0, 0] = r0 + trans * bg[0]
        rgb_ref[0, 1] = r1 + trans * bg[1]
        rgb_ref[0, 2] = r2 + trans * bg[2]
        dep_ref[0] = dep
        acc_ref[0] = 1.0 - trans

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "win", "bg_static",
                     "interpret"),
)
def rasterize_pallas(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_static: tuple[float, float, float] = (1.0, 1.0, 1.0),
    tile_size: int = 16,
    win: int = 5,
    interpret: bool = False,
):
    """Rasterize via the Pallas tile kernel. Background is static (a python
    tuple) since it's baked into the kernel epilogue.

    Returns (rgb [3,H,W], depth [1,H,W], alpha [1,H,W], aux).
    """
    if width % tile_size or height % tile_size:
        raise ValueError("width/height must be multiples of tile_size")
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th
    p = tile_size * tile_size
    rows, lanes = p // 128, 128

    inst, starts, counts, aux = pack_instances(proj, tw, th, tile_size, win)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, rows, lanes), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, lanes), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, lanes), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            # SMEM: per-Gaussian params are consumed as broadcast scalars and
            # SMEM allows arbitrary dynamic scalar indexing (VMEM lane offsets
            # must be 128-aligned).
            pltpu.SMEM((2, CHUNK // PACK_PER_ROW, PACK_PER_ROW * PACK16),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    rgb_t, dep_t, acc_t = pl.pallas_call(
        _kernel(tile_size, tw, bg_static),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, rows, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(starts, counts, inst)

    def to_image(tiled, ch):
        flat = tiled.reshape(th, tw, ch, tile_size, tile_size)
        return flat.transpose(2, 0, 3, 1, 4).reshape(ch, height, width)

    rgb = to_image(rgb_t.reshape(n_tiles, 3, p), 3)
    dep = to_image(dep_t.reshape(n_tiles, 1, p), 1)
    acc = to_image(acc_t.reshape(n_tiles, 1, p), 1)
    return rgb, dep, acc, aux
