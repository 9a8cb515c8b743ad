"""Pallas per-tile compositing kernel over sort-binned instance lists.

Serving/benchmark tier. Two stages, both shaped by measured TPU costs:

1. ``sorted_pack`` (XLA): expand each projected Gaussian into its covered
   16x16 tiles (static ``win x win`` slot window), then ONE
   ``lax.sort((tile_id, depth, gauss_idx), num_keys=2)`` yields every tile's
   instance list, contiguous and in EXACT front-to-back depth order (the
   CUDA rasterizer quantizes depth into its 64-bit key; we sort true f32
   depth — strictly stronger ordering). Tile segment starts come from one
   vectorized ``searchsorted``. No scatter anywhere: the earlier
   counting-rank + row-scatter design cost 60 + 190 ms at 65k Gaussians
   where this sort costs single-digit ms.

2. ``_kernel`` (Pallas): grid over tiles (optionally several tiles per
   program — their CONTIGUOUS instance span can then be fetched as ONE
   DMA, see the span fast path in ``_kernel``); each tile walk reads
   128-instance parameter chunks (chunk-major [n_chunks, 16, 128] layout
   so every DMA is a lane-aligned [16, 128] block) and composites them
   VECTORIZED: alpha for all 128 instances against all 256 pixels as one
   [256, 128] VPU batch, front-to-back order enforced by a log-step
   exclusive cumprod of (1 - alpha) along the instance (lane) axis, and the
   per-pixel channel accumulation done as ONE MXU matmul per chunk
   ([5, 128] channels x [256, 128] weights -> [5, 256]) — the fifth "ones"
   channel telescopes to the accumulated alpha, so 1 - T never needs a
   cross-layout transpose. Early-exits on transmittance saturation per
   chunk. Replaces the old scalar one-Gaussian-at-a-time loop (~40
   cycles/instance) with a few cycles/instance of VPU+MXU work.

There is no k_cap in this tier: every instance the projection emits is
composited (the dense XLA training tier still has one; its overflow is
reported there). Behavioral contract: SURVEY.md section 2.1 row 1
(gaussian_renderer/__init__.py:156-164 forward semantics).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

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

PACK16 = 16      # param rows: x y conic(3) rgb(3) opacity depth cut pad(5)
CHUNK = 128      # instances per DMA chunk / vector batch (lane width)
TRANS_EPS = 1e-4
# math, not jnp: this module can be first-imported lazily inside a jit
# trace (render.py defers the import), where eager jnp ops misbehave
LOG_ALPHA_MIN = math.log(ALPHA_MIN)


class PackedTiles(NamedTuple):
    rows16: jnp.ndarray      # [16, B_pad] f32 param-major, tile-grouped,
                             # depth-ordered along axis 1
    starts: jnp.ndarray      # [T] i32 segment starts (unaligned)
    counts: jnp.ndarray      # [T] i32 segment lengths
    gauss_idx: jnp.ndarray   # [B_pad] i32 source Gaussian per instance
    aux: RasterAux


def pack_rows(proj: ProjectedGaussians) -> jnp.ndarray:
    """[N, 16] per-Gaussian parameter rows."""
    n = proj.xy.shape[0]
    opacity = jnp.where(proj.valid, proj.opacity, 0.0)
    depth = jnp.where(jnp.isfinite(proj.depth), proj.depth, 0.0)
    return jnp.concatenate(
        [
            proj.xy, proj.conic, proj.color, opacity[:, None], depth[:, None],
            proj.power_cut[:, None], jnp.zeros((n, PACK16 - 11), jnp.float32),
        ],
        axis=1,
    )


def _expand_slots(xy, r, valid, depth, gidx_src, tw, th, tile_size, win):
    """Per-slot (tile_id, depth, gauss_idx) triplets for a win x win window.

    Dead slots (outside the Gaussian's span, or invalid Gaussians) get the
    sentinel tile tw*th and +inf-like depth so the sort groups them last.
    Everything is broadcast, never repeat/gather.
    """
    n = xy.shape[0]
    slots = win * win
    n_tiles = tw * th
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r) / tile_size), 0, tw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r) / tile_size), 0, th).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r) / tile_size) + 1, 0, tw).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r) / tile_size) + 1, 0, th).astype(jnp.int32)

    dj = jnp.arange(slots, dtype=jnp.int32)
    tx = x0[:, None] + (dj % win)[None, :]
    ty = y0[:, None] + (dj // win)[None, :]
    in_span = (tx < x1[:, None]) & (ty < y1[:, None]) & valid[:, None]
    tile_id = jnp.where(in_span, ty * tw + tx, n_tiles).reshape(-1)
    depth_c = jnp.where(jnp.isfinite(depth), depth, 3.4e38)
    depth_b = jnp.broadcast_to(depth_c[:, None], (n, slots)).reshape(-1)
    gidx = jnp.broadcast_to(gidx_src[:, None], (n, slots)).reshape(-1)
    return tile_id, depth_b, gidx


def round_big_cap(n: int) -> int:
    """Static size of the big-Gaussian side stream."""
    return min(n, max(2048, n // 8))


def choose_tpp(n_tiles: int, target: int) -> int:
    """Largest tiles-per-program <= target that divides n_tiles (the grid
    requires exact division); 1 when nothing else fits."""
    for t in range(min(target, n_tiles), 1, -1):
        if n_tiles % t == 0:
            return t
    return 1


def fused_depth_bits(n_tiles: int) -> int:
    """Bits of depth kept in the fused (tile << bits) | depth i32 sort key.

    Tile values span [0, n_tiles] (the sentinel is n_tiles), so the depth
    field gets whatever the tile field leaves of the 31 non-sign bits."""
    return 31 - max(1, n_tiles.bit_length())


def sorted_pack(proj: ProjectedGaussians, tw: int, th: int, tile_size: int,
                win: int, win_small: int = 2,
                big_cap: int | None = None,
                order: str = "exact") -> PackedTiles:
    """Sort-based tile binning with exact depth ordering.

    Two-class instance expansion: after densified training the vast
    majority of splats span <= win_small tiles per axis (measured ~91% at
    realistic scale), so expanding every Gaussian into win^2 slots wastes
    ~6x sort/gather work on dead slots. Gaussians whose span exceeds
    win_small go into a capped side stream expanded at the full win; both
    streams share the single (tile, depth) sort, so compositing order stays
    exact. If more than ``round_big_cap(N)`` Gaussians are oversized (only
    plausible in the earliest training iterations), the excess have their
    support ellipse shrunk to the small span, power_cut scaled to match —
    the same contract as projection's MAX_SPLAT_RADIUS.

    ``order`` selects the instance-ordering strategy (the pack is ~1/3 of a
    served frame, VERDICT r3 weak #3, so this is measured on-chip):
      * 'exact': lexicographic ``lax.sort((tile, f32 depth, idx),
        num_keys=2)`` — exact depth order, the strongest contract.
      * 'fused': ONE i32 key per instance, ``(tile << bits) | (depth's f32
        bit pattern >> (31 - bits))`` — positive floats compare like their
        bit patterns, so this is the CUDA rasterizer's own key semantics
        (tile major, quantized depth minor; .gitmodules:8-11 contract,
        which packs tile<<32|float-bits into a 64-bit radix key). With 625
        tiles the key keeps 21 depth bits: two instances order arbitrarily
        (but stably, by Gaussian index) only when their depths agree to
        ~1e-5 relative — photometrically nil. Halves the comparator width
        and drops one payload operand vs 'exact'.
    """
    n_tiles = tw * th
    n = proj.xy.shape[0]

    xy, r, valid = proj.xy, proj.radius, proj.valid
    depth = proj.depth
    gidx_all = jnp.arange(n, dtype=jnp.int32)

    if win <= win_small:
        tile_id, depth_b, gidx = _expand_slots(
            xy, r, valid, depth, gidx_all, tw, th, tile_size, win)
        slots_total = n * win * win
        proj_adj = proj
    else:
        if big_cap is None:
            big_cap = round_big_cap(n)
        # span > win_small along either axis => big
        small_rmax = (win_small - 1) * tile_size / 2.0 - 0.51
        is_big = (r > small_rmax) & valid
        score = jnp.where(is_big, r, -1.0)
        _, big_idx = jax.lax.top_k(score, big_cap)
        big_sel = score[big_idx] > 0.0
        in_big = jnp.zeros((n,), bool).at[big_idx].set(big_sel)

        # small stream: everyone not in the big list; oversize stragglers
        # (big-cap overflow) get ellipse-shrunk to the small span
        shrink = is_big & ~in_big
        r_small = jnp.where(shrink, small_rmax, r)
        cut_adj = jnp.where(
            shrink,
            proj.power_cut * (small_rmax / jnp.maximum(r, 1e-6)) ** 2,
            proj.power_cut)
        proj_adj = proj._replace(power_cut=cut_adj)
        tid_s, dep_s, gid_s = _expand_slots(
            xy, r_small, valid & ~in_big, depth, gidx_all,
            tw, th, tile_size, win_small)

        # big stream: gathered fields, full window
        tid_b, dep_b, gid_b = _expand_slots(
            xy[big_idx], r[big_idx], big_sel & valid[big_idx], depth[big_idx],
            big_idx, tw, th, tile_size, win)

        tile_id = jnp.concatenate([tid_s, tid_b])
        depth_b = jnp.concatenate([dep_s, dep_b])
        gidx = jnp.concatenate([gid_s, gid_b])
        slots_total = tile_id.shape[0]

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    if order == "fused":
        bits_d = fused_depth_bits(n_tiles)
        dbits = jax.lax.bitcast_convert_type(
            jnp.maximum(depth_b, 0.0), jnp.int32)
        # max(-0.0, 0.0) may keep -0.0 (bit 0x80000000), whose arithmetic
        # shift would OR a sign into the key and sort the instance before
        # tile 0 — mask the sign bit so -0.0 keys identically to +0.0
        key = (tile_id << bits_d) | ((dbits & 0x7FFFFFFF) >> (31 - bits_d))
        sorted_key, sorted_gidx = jax.lax.sort((key, gidx), num_keys=1)
        edges = jnp.searchsorted(
            sorted_key, bounds << bits_d, side="left").astype(jnp.int32)
    elif order == "exact":
        sorted_tile, _, sorted_gidx = jax.lax.sort(
            (tile_id, depth_b, gidx), num_keys=2
        )
        edges = jnp.searchsorted(
            sorted_tile, bounds, side="left").astype(jnp.int32)
    else:
        raise ValueError(f"unknown pack order: {order!r}")
    b = slots_total
    starts = edges[:-1]
    counts = edges[1:] - starts

    rows_sorted = pack_rows(proj_adj)[sorted_gidx]                   # [B, 16]
    # pad so any chunk DMA [astart, astart + CHUNK) stays in bounds
    b_pad = ((b + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
    rows_sorted = jnp.concatenate(
        [rows_sorted, jnp.zeros((b_pad - b, PACK16), jnp.float32)])
    sorted_gidx = jnp.concatenate(
        [sorted_gidx, jnp.full((b_pad - b,), n, jnp.int32)])
    rows16 = rows_sorted.T                                           # [16, B_pad]

    aux = RasterAux(n_dropped=jnp.zeros((), jnp.int32),
                    max_tile_count=jnp.max(counts))
    return PackedTiles(rows16, starts, counts, sorted_gidx, aux)


def _composite_chunk(blk, px, py, lane, posbase, start, count, trans, acc):
    """Composite one [16, CHUNK] parameter block over the tile's pixels.

    ``posbase`` is the absolute instance position of lane 0; instances
    outside [start, start + count) are masked dead. Returns the updated
    (trans [p, 1], acc [5, p]).

    The quadratic form is evaluated on the VPU. A monomial-matmul variant
    (la = P @ C on the MXU, see chunk_grads in pallas_train.py where the
    monomial basis already exists for the moment matmuls) was measured
    SLOWER here: the f32 HIGHEST-precision matmul costs 6 bf16 MXU passes
    per chunk, which on-chip lost ~0.5 ms/frame of serving kernel time vs
    the fused VPU ops (docs/results/hwq_r05d.json profile_serving_monomial
    kernel_only 5.53 ms vs 5.03 pre-monomial), so the forward keeps the
    elementwise form."""
    gx = blk[0:1, :]                                  # [1, CHUNK]
    gy = blk[1:2, :]
    ca = blk[2:3, :]
    cb = blk[3:4, :]
    cc = blk[4:5, :]
    op = blk[8:9, :]
    cut = blk[10:11, :]

    pos = posbase + lane                              # [1, CHUNK]
    live = (pos >= start) & (pos < start + count)

    dx = px - gx                                      # [p, CHUNK]
    dy = py - gy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    alpha = jnp.where(
        (power > 0.0) | (power < cut) | (alpha < ALPHA_MIN) | (~live),
        0.0, alpha)

    # exclusive cumprod of (1 - alpha) along the instance (lane) axis
    incl = 1.0 - alpha
    s = 1
    while s < CHUNK:
        shifted = jnp.where(lane >= s, pltpu.roll(incl, s, 1), 1.0)
        incl = incl * shifted
        s *= 2
    excl = jnp.where(lane >= 1, pltpu.roll(incl, 1, 1), 1.0)

    w = alpha * excl * trans                          # [p, CHUNK]
    # channels: r g b depth ones — the ones channel telescopes to
    # sum(w) = delta of (1 - T), keeping everything lane-major
    chans = jnp.concatenate(
        [blk[5:8, :], blk[9:10, :], jnp.ones((1, CHUNK), jnp.float32)],
        axis=0)                                       # [5, CHUNK]
    acc = acc + jax.lax.dot_general(
        chans, w, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # [5, p]
    trans = trans * incl[:, CHUNK - 1:CHUNK]          # [p, 1]
    return trans, acc


def _kernel(tile_size: int, tw: int, bg: tuple[float, float, float],
            tpp: int = 1, span_cap: int = 0):
    """Kernel factory. ``rows3d_hbm`` is the chunk-major [n_chunks, 16,
    CHUNK] view of the packed instance params.

    ``span_cap > 0`` (requires tpp > 1) enables the span fast path: a
    program's tpp tiles own CONTIGUOUS segments of the sorted instance
    array, so when their combined span fits ``span_cap`` chunks it is
    fetched as ONE DMA and every tile composites straight from VMEM. The
    per-tile double-buffered chunk walk remains as the overflow fallback.
    Rationale: tiles average around one chunk, so the walk pays one DMA
    latency per TILE that the double buffer cannot hide; the span path
    pays one DMA latency per PROGRAM."""
    p = tile_size * tile_size

    def kernel(start_ref, count_ref, rows3d_hbm, out_ref, buf, sem,
               *span_scratch):
        # hoisted: pl.program_id may not be used inside pl.when branches
        i0 = pl.program_id(0) * tpp
        if span_cap and tpp > 1:
            sbuf, ssem = span_scratch
            last = i0 + tpp - 1
            k0 = start_ref[i0] // CHUNK
            k_end = (start_ref[last] + count_ref[last]
                     + CHUNK - 1) // CHUNK                   # exclusive
            # static-size window [k0c, k0c + span_cap), shifted down when
            # near the end of the array (padding guarantees k0c >= 0)
            k0c = jnp.minimum(k0, rows3d_hbm.shape[0] - span_cap)
            fits = (k_end - k0c) <= span_cap

            span_dma = pltpu.make_async_copy(
                rows3d_hbm.at[pl.ds(k0c, span_cap)], sbuf, ssem)

            @pl.when(fits)
            def _():
                span_dma.start()
                span_dma.wait()
                for t in range(tpp):
                    _one_tile_vmem(i0, t, start_ref, count_ref, sbuf, k0c,
                                   out_ref)

            @pl.when(~fits)
            def _():
                for t in range(tpp):
                    _one_tile(i0, t, start_ref, count_ref, rows3d_hbm,
                              out_ref, buf, sem)
        else:
            for t in range(tpp):            # unrolled: tiles per program
                _one_tile(i0, t, start_ref, count_ref, rows3d_hbm, out_ref,
                          buf, sem)

    def _tile_pixels(i0, t):
        i = i0 + t
        ox = (i % tw) * tile_size
        oy = (i // tw) * tile_size
        # pixel coordinate columns [p, 1]; pixel index = y*tile + x
        pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (ox + pidx % tile_size).astype(jnp.float32)
        py = (oy + pidx // tile_size).astype(jnp.float32)
        return i, px, py

    def _write_tile(t, out_ref, acc):
        alpha_img = acc[4:5, :]                               # [1, p] = 1 - T
        t_final = 1.0 - alpha_img
        out_ref[t] = jnp.concatenate(
            [acc[0:1, :] + t_final * bg[0],
             acc[1:2, :] + t_final * bg[1],
             acc[2:3, :] + t_final * bg[2],
             acc[3:4, :], alpha_img,
             jnp.zeros((3, p), jnp.float32)], axis=0)         # [8, p]

    def _one_tile_vmem(i0, t, start_ref, count_ref, sbuf, k0c, out_ref):
        i, px, py = _tile_pixels(i0, t)
        start = start_ref[i]
        count = count_ref[i]
        kt = start // CHUNK                  # first chunk of this tile
        n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def chunk_body(state):
            ci, trans, acc = state
            blk = sbuf[kt - k0c + ci]                         # [16, CHUNK]
            trans, acc = _composite_chunk(
                blk, px, py, lane, (kt + ci) * CHUNK, start, count, trans,
                acc)
            return (ci + 1, trans, acc)

        def chunk_cond(state):
            ci, trans = state[0], state[1]
            return (ci < n_chunks) & (jnp.max(trans) > TRANS_EPS)

        _, _, acc = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (0, jnp.ones((p, 1), jnp.float32), jnp.zeros((5, p), jnp.float32)))
        _write_tile(t, out_ref, acc)

    def _one_tile(i0, t, start_ref, count_ref, rows3d_hbm, out_ref, buf,
                  sem):
        i, px, py = _tile_pixels(i0, t)
        start = start_ref[i]
        count = count_ref[i]
        kt = start // CHUNK
        n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK

        def get_dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                rows3d_hbm.at[kt + chunk_idx],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def chunk_body(state):
            ci, trans, acc = state

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma((ci + 1) % 2, ci + 1).start()

            get_dma(ci % 2, ci).wait()
            blk = buf[ci % 2]                                # [16, CHUNK]
            trans, acc = _composite_chunk(
                blk, px, py, lane, (kt + ci) * CHUNK, start, count, trans,
                acc)
            return (ci + 1, trans, acc)

        def chunk_cond(state):
            ci, trans = state[0], state[1]
            return (ci < n_chunks) & (jnp.max(trans) > TRANS_EPS)

        ci_end, trans, acc = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (0, jnp.ones((p, 1), jnp.float32), jnp.zeros((5, p), jnp.float32)))

        # Early transmittance exit can leave the prefetched chunk's DMA in
        # flight; drain it so the next grid step's semaphores start clean.
        @pl.when((ci_end < n_chunks) & (n_chunks > 0))
        def _():
            get_dma(ci_end % 2, ci_end).wait()

        _write_tile(t, out_ref, acc)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "win", "bg_static",
                     "interpret", "big_cap", "tiles_per_program", "span_cap",
                     "pack_order"),
)
def rasterize_pallas(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_static: tuple[float, float, float] = (1.0, 1.0, 1.0),
    tile_size: int | None = None,
    win: int | None = None,
    interpret: bool = False,
    big_cap: int | None = None,
    tiles_per_program: int | None = None,
    span_cap: int | None = None,
    pack_order: str = "exact",
):
    """Rasterize via the Pallas tile kernel. Background is static (a python
    tuple) since it's baked into the kernel epilogue.

    ``tile_size=None`` auto-selects: 32px tiles for large frames (fewer grid
    programs -> ~7% faster at 800x800/65k where mean tile occupancy is low
    and per-program setup dominates; measured 8.80 vs 9.37 ms/frame, max
    pixel diff 7e-5), 16px otherwise. ``win`` (slot window per axis) defaults
    to the span a MAX_SPLAT_RADIUS splat needs at the chosen tile size.

    Returns (rgb [3,H,W], depth [1,H,W], alpha [1,H,W], aux).
    """
    if tile_size is None:
        tile_size = 32 if (width % 32 == 0 and height % 32 == 0
                           and min(width, height) >= 512) else 16
    if win is None:
        win = 5 if tile_size == 16 else 3
    if width % tile_size or height % tile_size:
        raise ValueError("width/height must be multiples of tile_size")
    tw, th = width // tile_size, height // tile_size

    packed = sorted_pack(proj, tw, th, tile_size, win, big_cap=big_cap,
                         order=pack_order)
    out_t = raster_forward_tiles(packed, width, height, tile_size, bg_static,
                                 interpret,
                                 tiles_per_program=tiles_per_program,
                                 span_cap=span_cap)
    rgb, dep, acc = tiles_to_images(out_t, width, height, tile_size)
    return rgb, dep, acc, packed.aux


def raster_forward_tiles(packed: PackedTiles, width: int, height: int,
                         tile_size: int,
                         bg_static: tuple[float, float, float],
                         interpret: bool = False,
                         tiles_per_program: int | None = None,
                         span_cap: int | None = None) -> jnp.ndarray:
    """Run the compositing kernel; returns raw tiled output
    [n_tiles, 8, tile_size^2] with channels (r, g, b, depth, alpha, 0,0,0).

    ``tiles_per_program`` unrolls several tiles into one grid program; with
    ``span_cap > 0`` the program fetches its tiles' combined instance span
    as ONE DMA when it fits span_cap chunks (see _kernel). Plain unrolling
    without the span path bought only ~2% on the 65k/800x800 bench (the
    per-tile walk is DMA-latency bound and the double buffer cannot hide
    the first chunk's latency), which is why tpp defaults to 1 unless the
    span path is on.
    """
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th
    p = tile_size * tile_size
    if tiles_per_program is None or n_tiles % tiles_per_program:
        tiles_per_program = 1
    tpp = tiles_per_program
    if span_cap is None or tpp == 1:
        span_cap = 0

    # chunk-major 3D view of the packed params: rows3d[k] is one [16, CHUNK]
    # DMA block (sorted_pack pads B to a chunk multiple)
    b_pad = packed.rows16.shape[1]
    n_chunks_arr = b_pad // CHUNK
    span_cap = min(span_cap, n_chunks_arr)
    rows3d = packed.rows16.reshape(PACK16, n_chunks_arr, CHUNK)
    rows3d = rows3d.transpose(1, 0, 2)

    scratch_shapes = [
        pltpu.VMEM((2, PACK16, CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if span_cap:
        scratch_shapes += [
            pltpu.VMEM((span_cap, PACK16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tpp,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tpp, 8, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
    )

    (out_t,) = pl.pallas_call(
        _kernel(tile_size, tw, bg_static, tpp, span_cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, p), jnp.float32),
        ],
        interpret=interpret,
    )(packed.starts, packed.counts, rows3d)
    return out_t


def tiles_to_images(out_t: jnp.ndarray, width: int, height: int,
                    tile_size: int):
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th

    def to_image(tiled, ch):
        flat = tiled.reshape(th, tw, ch, tile_size, tile_size)
        return flat.transpose(2, 0, 3, 1, 4).reshape(ch, height, width)

    rgb = to_image(out_t[:, 0:3, :], 3)
    dep = to_image(out_t[:, 3:4, :], 1)
    acc = to_image(out_t[:, 4:5, :], 1)
    return rgb, dep, acc
