"""Differentiable Pallas rasterization (custom VJP) — the training tier.

Forward = the serving compositing walk (sort-binned exact-depth instance
lists, vectorized chunks; pallas_tiled.py) extended to WRITE the running
transmittance at every chunk boundary to HBM. Backward = ONE Pallas kernel
that walks each tile's chunks in REVERSE order, re-deriving exact
front-to-back T inside each chunk from its saved boundary (T_i = T_boundary
* exclusive-cumprod — products only, no divisions), and emits analytic
gradients for every instance, matching the CUDA rasterizer's backward
contract (grads to means2D/conic/color/opacity, SURVEY.md section 2.1 row 1;
reference gaussian_renderer/__init__.py:49-53 retains the viewspace mean2D
gradient for density control — here that arrives through the xy cotangent).

History: the first backward design re-derived T back-to-front by dividing
through prod(1 - alpha), which EXPLODES in fp32 once a chunk stacks >6
near-opaque instances (observed as NaN training loss at ~15k Gaussians); the
second design fixed that with a division-free TWO-sweep forward walk costing
~16% extra. The saved boundaries give the best of both: a single reverse
sweep, division-free, AND the forward's transmittance early-exit now prunes
the backward too (chunks the forward never started have no gradient, the
same truncation the CUDA kernel applies via its last-contributor index).

Boundary storage is GROUP-PACKED for Mosaic's DMA alignment rules: a per-
chunk [p, 1] column can't be DMA'd (trailing size-1 lane dim — Mosaic
requires lane slices aligned to 128), and lane<->sublane transposes inside
the kernel aren't supported either. Instead, 128 consecutive chunk
boundaries share one [p, 128] block (lane = flat chunk index mod 128), held
in persistent VMEM scratch across the sequential tile grid and flushed as a
single aligned DMA when the walk crosses a group edge. The flat chunk index
(per-tile offsets from ``chunk_layout``) is monotone over the whole grid, so
each group is flushed exactly once; the backward caches the current group
block and extracts a column with a lane-masked reduce — every op involved
(lane broadcast, lane-masked select, lane reduction, [p, 128] DMA) is
already load-bearing elsewhere in these kernels.

Backward math per tile (out_c = sum_i c_i a_i T_i + bg_c T_N):
    dL/dc_i   = g_c w_i
    dL/da_i   = u_i T_i + (K - S_i) / (1 - a_i)
        u_i = sum_c g_c c_i        (per-pixel-instance "color dot grad")
        S_i = sum_{j>i} u_j w_j    (suffix: in-chunk reverse prefix + a
                                    cross-chunk carry accumulated back-to-front)
        K   = (g_acc - sum_c g_c bg_c) T_N

Per-instance reductions over pixels collapse into TWO MXU matmuls per
chunk: color/depth grads are g4^T @ w, and all conic/xy/opacity grads are
linear combinations of the moments sum_p dpow * px^a py^b for
(a,b) in {00,10,01,20,11,02} — one [p, 6]^T @ [p, CHUNK] matmul in
TILE-LOCAL pixel coordinates (global coords would lose ~3 digits to
cancellation).

Instance gradients land param-major in HBM ([16, B]); tiles sharing a
boundary chunk resolve it by read-accumulate-write (the grid is sequential,
so the earlier tile's flush is ordered before the later tile's read). An
XLA segment_sum over the sorted Gaussian ids then reduces instances to
per-Gaussian gradients — dead slots carry the sentinel id N and fall off.
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
from cloth_splatting_tpu.ops.rasterize.pallas_tiled import (
    CHUNK,
    LOG_ALPHA_MIN,
    PACK16,
    TRANS_EPS,
    PackedTiles,
    _composite_chunk,
    raster_forward_tiles,
    sorted_pack,
    tiles_to_images,
)

GCH = 8  # grad-image channels: g_r g_g g_b g_dep g_acc acc_fwd u_tot pad


def chunk_layout(packed: PackedTiles, n_tiles: int):
    """Per-tile chunk-boundary offsets into the flat boundary index space.

    Tile i's walk covers chunks [astart_i/CHUNK, ceil((start_i+count_i)/
    CHUNK)); consecutive tiles overlap by at most one chunk, so the flat
    total is bounded by B_pad/CHUNK + n_tiles (static)."""
    astart = (packed.starts // CHUNK) * CHUNK
    n_chunks = (packed.starts - astart + packed.counts + CHUNK - 1) // CHUNK
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_chunks).astype(jnp.int32)]
    )[:-1]
    bound = packed.rows16.shape[1] // CHUNK + n_tiles
    return offsets, bound


# --------------------------------------------------------------- forward

def _fwd_train_kernel(tile_size: int, tw: int, bg: tuple[float, float, float],
                      n_programs: int, tpp: int = 1, span_cap: int = 0):
    """Serving compositing walk + group-packed transmittance-boundary
    writes (boundary of flat chunk f lands in group f//128, lane f%128).

    ``tpp``/``span_cap`` mirror the serving kernel's span fast path (one
    DMA per multi-tile program; see pallas_tiled._kernel). The boundary
    bookkeeping is untouched by the unroll: flat chunk indices stay
    monotone over tiles processed in grid order, so groups still flush
    exactly once."""
    p = tile_size * tile_size

    def kernel(start_ref, count_ref, off_ref, rows3d_hbm, tb_in_hbm, out_ref,
               tb_hbm, buf, gscr, sem, fsem, cur, *span_scratch):
        del tb_in_hbm  # zero-initialized alias of tb_hbm
        pid = pl.program_id(0)
        i0 = pid * tpp

        @pl.when(pid == 0)
        def _():
            gscr[...] = jnp.zeros((p, CHUNK), jnp.float32)
            cur[0] = 0

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def flush_group(g):
            dma = pltpu.make_async_copy(gscr, tb_hbm.at[g], fsem.at[0])
            dma.start()
            dma.wait()

        def tile_coords(t):
            i = i0 + t
            ox = (i % tw) * tile_size
            oy = (i // tw) * tile_size
            pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
            px = (ox + pidx % tile_size).astype(jnp.float32)
            py = (oy + pidx // tile_size).astype(jnp.float32)
            return i, px, py

        def record_boundary(off, ci, trans):
            # T at this chunk's start goes to its group slot; crossing into
            # a new group flushes the finished one (flat index is monotone
            # across the whole sequential grid, including unrolled tiles)
            f = off + ci
            g = f // CHUNK
            l = f % CHUNK

            @pl.when(g != cur[0])
            def _():
                flush_group(cur[0])
                gscr[...] = jnp.zeros((p, CHUNK), jnp.float32)
                cur[0] = g

            gscr[...] = jnp.where(lane == l, trans, gscr[...])

        def write_out(t, acc):
            alpha_img = acc[4:5, :]
            t_final = 1.0 - alpha_img
            out_ref[t] = jnp.concatenate(
                [acc[0:1, :] + t_final * bg[0],
                 acc[1:2, :] + t_final * bg[1],
                 acc[2:3, :] + t_final * bg[2],
                 acc[3:4, :], alpha_img,
                 jnp.zeros((3, p), jnp.float32)], axis=0)

        def one_tile_vmem(t, sbuf, k0c):
            i, px, py = tile_coords(t)
            start = start_ref[i]
            count = count_ref[i]
            off = off_ref[i]
            kt = start // CHUNK
            n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK

            def chunk_body(state):
                ci, trans, acc = state
                record_boundary(off, ci, trans)
                blk = sbuf[kt - k0c + ci]
                trans, acc = _composite_chunk(
                    blk, px, py, lane, (kt + ci) * CHUNK, start, count,
                    trans, acc)
                return (ci + 1, trans, acc)

            def chunk_cond(state):
                ci, trans = state[0], state[1]
                return (ci < n_chunks) & (jnp.max(trans) > TRANS_EPS)

            _, _, acc = jax.lax.while_loop(
                chunk_cond, chunk_body,
                (0, jnp.ones((p, 1), jnp.float32),
                 jnp.zeros((5, p), jnp.float32)))
            write_out(t, acc)

        def one_tile_dma(t):
            i, px, py = tile_coords(t)
            start = start_ref[i]
            count = count_ref[i]
            off = off_ref[i]
            kt = start // CHUNK
            n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK

            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    rows3d_hbm.at[kt + chunk_idx], buf.at[slot],
                    sem.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, 0).start()

            def chunk_body(state):
                ci, trans, acc = state

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma((ci + 1) % 2, ci + 1).start()

                record_boundary(off, ci, trans)
                get_dma(ci % 2, ci).wait()
                blk = buf[ci % 2]                                # [16, CHUNK]
                trans, acc = _composite_chunk(
                    blk, px, py, lane, (kt + ci) * CHUNK, start, count,
                    trans, acc)
                return (ci + 1, trans, acc)

            def chunk_cond(state):
                ci, trans = state[0], state[1]
                return (ci < n_chunks) & (jnp.max(trans) > TRANS_EPS)

            ci_end, trans, acc = jax.lax.while_loop(
                chunk_cond, chunk_body,
                (0, jnp.ones((p, 1), jnp.float32),
                 jnp.zeros((5, p), jnp.float32)))

            # drain the prefetched chunk an early exit can leave in flight
            @pl.when((ci_end < n_chunks) & (n_chunks > 0))
            def _():
                get_dma(ci_end % 2, ci_end).wait()

            write_out(t, acc)

        if span_cap and tpp > 1:
            sbuf, ssem = span_scratch
            last = i0 + tpp - 1
            k0 = start_ref[i0] // CHUNK
            k_end = (start_ref[last] + count_ref[last]
                     + CHUNK - 1) // CHUNK                   # exclusive
            k0c = jnp.minimum(k0, rows3d_hbm.shape[0] - span_cap)
            fits = (k_end - k0c) <= span_cap

            span_dma = pltpu.make_async_copy(
                rows3d_hbm.at[pl.ds(k0c, span_cap)], sbuf, ssem)

            @pl.when(fits)
            def _():
                span_dma.start()
                span_dma.wait()
                for t in range(tpp):
                    one_tile_vmem(t, sbuf, k0c)

            @pl.when(~fits)
            def _():
                for t in range(tpp):
                    one_tile_dma(t)
        else:
            for t in range(tpp):
                one_tile_dma(t)

        # last program flushes the in-progress group
        @pl.when(pid == n_programs - 1)
        def _():
            flush_group(cur[0])

    return kernel


def raster_forward_train(packed: PackedTiles, width: int, height: int,
                         tile_size: int, bg: tuple[float, float, float],
                         interpret: bool,
                         tiles_per_program: int | None = None,
                         span_cap: int | None = None):
    """Forward walk that also records per-chunk transmittance boundaries.

    Returns (out_t [n_tiles, 8, p], tbounds [n_groups, p, 128]) where the
    boundary of flat chunk f lives at tbounds[f // 128, :, f % 128];
    boundaries of chunks the walk never started stay zero (their instances
    contribute < TRANS_EPS and the backward skips them, matching the
    truncation)."""
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th
    p = tile_size * tile_size
    offsets, bound = chunk_layout(packed, n_tiles)
    n_groups = (bound + CHUNK - 1) // CHUNK

    if tiles_per_program is None or n_tiles % tiles_per_program:
        tiles_per_program = 1
    tpp = tiles_per_program
    if span_cap is None or tpp == 1:
        span_cap = 0

    b_pad = packed.rows16.shape[1]
    n_chunks_arr = b_pad // CHUNK
    span_cap = min(span_cap, n_chunks_arr)
    rows3d = packed.rows16.reshape(PACK16, n_chunks_arr, CHUNK)
    rows3d = rows3d.transpose(1, 0, 2)

    scratch_shapes = [
        pltpu.VMEM((2, PACK16, CHUNK), jnp.float32),
        pltpu.VMEM((p, CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((1,)),
        pltpu.SMEM((1,), jnp.int32),
    ]
    if span_cap:
        scratch_shapes += [
            pltpu.VMEM((span_cap, PACK16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # rows3d
            pl.BlockSpec(memory_space=pl.ANY),                 # tbounds alias
        ],
        out_specs=[
            pl.BlockSpec((tpp, 8, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),                 # tbounds
        ],
        scratch_shapes=scratch_shapes,
    )
    tb_zeros = jnp.zeros((n_groups, p, CHUNK), jnp.float32)
    out_t, tbounds = pl.pallas_call(
        _fwd_train_kernel(tile_size, tw, bg, n_tiles // tpp, tpp, span_cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, p), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, p, CHUNK), jnp.float32),
        ],
        # inputs incl. 3 scalar-prefetch args: rows3d is 3, tb_zeros is 4
        input_output_aliases={4: 1},
        interpret=interpret,
    )(packed.starts, packed.counts, offsets, rows3d, tb_zeros)
    return out_t, tbounds


# --------------------------------------------------------------- backward

def _bwd_kernel_fwd_order(tile_size: int, tw: int,
                          bg: tuple[float, float, float],
                          n_programs: int, tpp: int = 1):
    """Forward-order gradient sweep with a rolling VMEM chunk accumulator.

    The reverse sweep (below, kept for the span path) serializes up to three
    DMA round-trips per chunk on the gradient path: a read-modify-write for
    chunks shared with the previous tile — and at realistic occupancy
    (~92 instances per 32px tile vs CHUNK=128) almost EVERY tile shares its
    head chunk, so the RMW wait gates almost every tile (measured bwd = 2.4x
    fwd, VERDICT r3 weak #4). This kernel removes the gradient-path waits
    entirely by walking chunks in ASCENDING order:

      * The suffix S_i no longer needs back-to-front accumulation: with the
        forward outputs in hand, sum_i u_i w_i over a whole pixel is the
        closed form U_tot = sum_c g_c (out_c - bg_c T_N) + g_dep out_dep,
        so S_i = U_tot - prefix_{<=i} where the prefix accumulates in walk
        order. (Exact-math identity; fp differences vs the reverse sweep are
        below the gradient tests' tolerance.)
      * Tiles ascend the instance array and tile i+1's head chunk is tile
        i's tail chunk, so the flat chunk index is GLOBALLY non-decreasing:
        one persistent VMEM accumulator block absorbs every tile's
        contribution to the current chunk, and a chunk is flushed to HBM
        exactly ONCE, when the walk advances past it. No read-back, no
        write-wait on the critical path — flushes are double-buffered and
        only waited when their slot is reused (or at grid end).

    Never-started chunks (forward early-exit; boundary == 0) contribute
    zero: w == 0 makes their prefix term vanish automatically and the
    gradient block is gated, so flushing their accumulated zeros matches the
    aliased zero-initialized output.
    """
    p = tile_size * tile_size

    def kernel(start_ref, count_ref, off_ref, rows3d_hbm, gimg_ref, tb_hbm,
               grads_in_hbm, grads3d_hbm, buf, gbuf, gacc, sem, gbsem, osem,
               st):
        del grads_in_hbm  # zero-initialized alias of grads3d_hbm
        pid = pl.program_id(0)
        i0 = pid * tpp
        half = tile_size / 2.0
        pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (pidx % tile_size).astype(jnp.float32) - half
        py = (pidx // tile_size).astype(jnp.float32) - half
        p6 = jnp.concatenate(
            [jnp.ones((p, 1), jnp.float32), px, py, px * px, px * py, py * py],
            axis=1)                                         # [p, 6]

        # st (SMEM): 0 = current chunk (-1 none), 1 = accumulator slot,
        #            2/3 = flush pending per slot, 4 = cached boundary group
        @pl.when(pid == 0)
        def _():
            st[0] = -1
            st[1] = 0
            st[2] = 0
            st[3] = 0
            st[4] = -1

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def osem_wait(s):
            # same-shape descriptor: wait() only consumes the semaphore
            pltpu.make_async_copy(gacc.at[s], grads3d_hbm.at[0],
                                  osem.at[s]).wait()

        def set_pend(s, value):
            # static SMEM indices only (dynamic SMEM stores are not a
            # Mosaic-proven pattern; dynamic .at[] on VMEM/semaphores is)
            @pl.when(s == 0)
            def _():
                st[2] = value

            @pl.when(s == 1)
            def _():
                st[3] = value

        def advance_to(f):
            @pl.when(st[0] != f)
            def _():
                @pl.when(st[0] >= 0)
                def _():
                    s = st[1]
                    pltpu.make_async_copy(gacc.at[s], grads3d_hbm.at[st[0]],
                                          osem.at[s]).start()
                    set_pend(s, 1)
                    st[1] = 1 - s

                s2 = st[1]
                pend2 = jnp.where(s2 == 0, st[2], st[3])

                @pl.when(pend2 == 1)
                def _():
                    osem_wait(s2)
                    set_pend(s2, 0)

                gacc[s2] = jnp.zeros((PACK16, CHUNK), jnp.float32)
                st[0] = f

        def fetch_boundary(off, ci):
            f = off + ci
            g = f // CHUNK
            l = f % CHUNK

            @pl.when(g != st[4])
            def _():
                dma = pltpu.make_async_copy(tb_hbm.at[g], gbuf, gbsem.at[0])
                dma.start()
                dma.wait()
                st[4] = g

            return jnp.sum(
                jnp.where(lane == l, gbuf[...], 0.0), axis=1, keepdims=True)

        def tile_fields(t):
            i = i0 + t
            ox = (i % tw) * tile_size + half
            oy = (i // tw) * tile_size + half
            g_r = gimg_ref[t, :, 0:1]                       # [p, 1]
            g_g = gimg_ref[t, :, 1:2]
            g_b = gimg_ref[t, :, 2:3]
            g_d = gimg_ref[t, :, 3:4]
            g_a = gimg_ref[t, :, 4:5]
            t_fin = 1.0 - gimg_ref[t, :, 5:6]               # T_N = 1 - acc
            kk = (g_a - (g_r * bg[0] + g_g * bg[1] + g_b * bg[2])) * t_fin
            g4 = gimg_ref[t, :, 0:4]                        # [p, 4]
            u_tot = gimg_ref[t, :, 6:7]                     # [p, 1]
            return i, ox, oy, (g_r, g_g, g_b, g_d, g4, kk), u_tot

        def one_tile(t):
            i, ox, oy, fields, u_tot = tile_fields(t)
            start = start_ref[i]
            count = count_ref[i]
            off = off_ref[i]
            kt = start // CHUNK
            n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK

            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    rows3d_hbm.at[kt + chunk_idx], buf.at[slot],
                    sem.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, 0).start()

            def sweep(ci, p_carry):
                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma((ci + 1) % 2, ci + 1).start()

                advance_to(kt + ci)
                t_start = fetch_boundary(off, ci)
                started = jnp.max(t_start) > 0.0
                get_dma(ci % 2, ci).wait()
                blk = buf[ci % 2]
                gblk, chunk_total = chunk_grads(
                    blk, px, py, lane, p6, ox, oy, fields,
                    (kt + ci) * CHUNK, start, count, t_start,
                    suffix=u_tot - p_carry, suffix_is_remainder=True)
                s = st[1]
                gacc[s] = gacc[s] + jnp.where(started, gblk, 0.0)
                return p_carry + chunk_total

            jax.lax.fori_loop(0, n_chunks, sweep,
                              jnp.zeros((p, 1), jnp.float32))

        for t in range(tpp):
            one_tile(t)

        # last program: flush the live accumulator and drain both slots
        @pl.when(pid == n_programs - 1)
        def _():
            @pl.when(st[0] >= 0)
            def _():
                s = st[1]
                pltpu.make_async_copy(gacc.at[s], grads3d_hbm.at[st[0]],
                                      osem.at[s]).start()
                set_pend(s, 1)

            for s in (0, 1):
                @pl.when(st[2 + s] == 1)  # s is a PYTHON int: static index
                def _():
                    osem_wait(s)
                    st[2 + s] = 0

    return kernel


def chunk_grads(blk, px, py, lane, p6, ox, oy, fields, posbase, start, count,
                t_start, suffix, suffix_is_remainder):
    """Gradient block [16, CHUNK] + this chunk's total sum_i u_i w_i.

    ``suffix`` feeds S_i (the occlusion term): with
    ``suffix_is_remainder=True`` it is U_remaining = U_tot - prefix of
    EARLIER chunks, so S_i = suffix - in-chunk inclusive prefix (forward
    sweep); with False it is the carry of LATER chunks, so S_i =
    (chunk_total - prefix) + suffix (reverse sweep)."""
    g_r, g_g, g_b, g_d, g4, kk = fields
    del g_r, g_g, g_b, g_d                          # folded into the u matmul
    gx = blk[0:1, :] - ox                           # tile-local
    gy = blk[1:2, :] - oy
    ca = blk[2:3, :]
    cb = blk[3:4, :]
    cc = blk[4:5, :]
    op = blk[8:9, :]
    cut = blk[10:11, :]
    pos = posbase + lane
    live = (pos >= start) & (pos < start + count)

    # log-alpha via ONE MXU matmul over the p6 pixel monomials (the same
    # coefficient fold as the serving compositor — see
    # pallas_tiled._composite_chunk): la = power + log op, dead lanes get a
    # -1e4 constant so exp underflows to zero.
    log_op = jnp.log(jnp.maximum(op, 1e-30))        # [1, CHUNK]
    c0 = (-0.5 * (ca * gx * gx + cc * gy * gy) - cb * gx * gy) + log_op
    c0 = jnp.where(live, c0, -1e4)
    cmat = jnp.concatenate(
        [c0, ca * gx + cb * gy, cc * gy + cb * gx,
         -0.5 * ca, -cb, -0.5 * cc], axis=0)        # [6, CHUNK]
    la = jax.lax.dot_general(
        p6, cmat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)         # [p, CHUNK]
    a_raw = jnp.exp(la)                             # = op * exp(power)
    clamped = a_raw > ALPHA_MAX
    alpha = jnp.minimum(ALPHA_MAX, a_raw)
    dead = ((la > log_op) | (la < cut + log_op) | (la < LOG_ALPHA_MIN)
            | (~live))
    alpha = jnp.where(dead, 0.0, alpha)
    incl = 1.0 - alpha
    sh = 1
    while sh < CHUNK:
        shifted = jnp.where(lane >= sh, pltpu.roll(incl, sh, 1), 1.0)
        incl = incl * shifted
        sh *= 2
    excl = jnp.where(lane >= 1, pltpu.roll(incl, 1, 1), 1.0)

    t_i = t_start * excl                            # [p, CHUNK] exact
    w = alpha * t_i
    ch4 = jnp.concatenate([blk[5:8, :], blk[9:10, :]], axis=0)  # [4, CHUNK]
    u = jax.lax.dot_general(
        g4, ch4, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)         # [p, CHUNK] MXU
    uw = u * w

    # inclusive forward prefix of uw along the lane axis
    cum = uw
    sh = 1
    while sh < CHUNK:
        cum = cum + jnp.where(lane >= sh, pltpu.roll(cum, sh, 1), 0.0)
        sh *= 2
    chunk_total = cum[:, CHUNK - 1:CHUNK]           # [p, 1]
    if suffix_is_remainder:
        s_i = suffix - cum
    else:
        s_i = (chunk_total - cum) + suffix

    dl_da = u * t_i + (kk - s_i) / jnp.maximum(1.0 - alpha, 1e-3)
    grad_gate = dead | clamped
    dpow = jnp.where(grad_gate, 0.0, dl_da * a_raw)

    # per-instance reductions on the MXU
    cg = jax.lax.dot_general(
        g4, w, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)         # [4, CHUNK]
    mom = jax.lax.dot_general(
        p6, dpow, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)         # [6, CHUNK]
    # dL/dop per pixel is dl_da * expp = dpow / op, so its pixel sum is the
    # zeroth moment scaled by 1/op — no separate [p, CHUNK] product/reduce
    dop = mom[0:1, :] / jnp.maximum(op, 1e-30)      # [1, CHUNK]

    m00 = mom[0:1, :]
    m10 = mom[1:2, :]
    m01 = mom[2:3, :]
    m20 = mom[3:4, :]
    m11 = mom[4:5, :]
    m02 = mom[5:6, :]
    sdx = m10 - gx * m00
    sdy = m01 - gy * m00
    sdx2 = m20 - 2.0 * gx * m10 + gx * gx * m00
    sdy2 = m02 - 2.0 * gy * m01 + gy * gy * m00
    sdxdy = m11 - gy * m10 - gx * m01 + gx * gy * m00

    dgx = ca * sdx + cb * sdy
    dgy = cc * sdy + cb * sdx
    dca = -0.5 * sdx2
    dcb = -sdxdy
    dcc = -0.5 * sdy2

    zero = jnp.zeros((1, CHUNK), jnp.float32)
    gblk = jnp.concatenate(
        [dgx, dgy, dca, dcb, dcc,
         cg[0:1], cg[1:2], cg[2:3], dop, cg[3:4],
         zero, zero, zero, zero, zero, zero], axis=0)  # [16, CHUNK]
    gblk = jnp.where(live, gblk, 0.0)
    return gblk, chunk_total


def _bwd_kernel(tile_size: int, tw: int, bg: tuple[float, float, float],
                tpp: int = 1, span_cap: int = 0):
    """Reverse-sweep gradient kernel.

    ``tpp``/``span_cap`` mirror the forward's span fast path, and pay off
    even more here: the per-chunk walk serializes THREE DMA waits per tile
    (row read + gradient read-back/write-back), where the span path does
    one row-span read, one gradient-span read, and one gradient-span write
    per PROGRAM. Gradient accumulation order is preserved exactly — the
    old path accumulates a shared chunk as (earlier tile's value) + (this
    tile's block) through HBM read-modify-write, the span path as the same
    left-to-right sum in VMEM — so outputs stay bit-identical."""
    p = tile_size * tile_size

    def kernel(start_ref, count_ref, off_ref, rows3d_hbm, gimg_ref, tb_hbm,
               grads_in_hbm, grads3d_hbm, buf, gbuf, gout, sem, gbsem, osem,
               cur, *span_scratch):
        # grads_in_hbm is the zero-initialized alias of grads3d_hbm; all
        # traffic goes through the output ref (same memory)
        del grads_in_hbm
        pid = pl.program_id(0)
        i0 = pid * tpp
        # tile-local pixel coordinates, centered to keep moments conditioned
        half = tile_size / 2.0
        pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (pidx % tile_size).astype(jnp.float32) - half
        py = (pidx // tile_size).astype(jnp.float32) - half
        p6 = jnp.concatenate(
            [jnp.ones((p, 1), jnp.float32), px, py, px * px, px * py, py * py],
            axis=1)                                         # [p, 6]

        @pl.when(pid == 0)
        def _():
            cur[0] = -1  # no group cached yet

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def fetch_boundary(off, ci):
            # boundary of flat chunk f sits in group f//128 at lane f%128;
            # tiles walk flat indices near-monotonically so the cached
            # group block usually survives many tiles
            f = off + ci
            g = f // CHUNK
            l = f % CHUNK

            @pl.when(g != cur[0])
            def _():
                dma = pltpu.make_async_copy(tb_hbm.at[g], gbuf, gbsem.at[0])
                dma.start()
                dma.wait()
                cur[0] = g

            return jnp.sum(
                jnp.where(lane == l, gbuf[...], 0.0), axis=1, keepdims=True)

        def tile_fields(t):
            i = i0 + t
            ox = (i % tw) * tile_size + half
            oy = (i // tw) * tile_size + half
            g_r = gimg_ref[t, :, 0:1]                       # [p, 1]
            g_g = gimg_ref[t, :, 1:2]
            g_b = gimg_ref[t, :, 2:3]
            g_d = gimg_ref[t, :, 3:4]
            g_a = gimg_ref[t, :, 4:5]
            t_fin = 1.0 - gimg_ref[t, :, 5:6]               # T_N = 1 - acc
            kk = (g_a - (g_r * bg[0] + g_g * bg[1] + g_b * bg[2])) * t_fin
            g4 = gimg_ref[t, :, 0:4]                        # [p, 4]
            return i, ox, oy, (g_r, g_g, g_b, g_d, g4, kk)

        def one_tile_dma(t):
            i, ox, oy, fields = tile_fields(t)
            start = start_ref[i]
            count = count_ref[i]
            off = off_ref[i]
            kt = start // CHUNK
            n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK

            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    rows3d_hbm.at[kt + chunk_idx], buf.at[slot],
                    sem.at[slot])

            def put_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    gout.at[slot], grads3d_hbm.at[kt + chunk_idx],
                    osem.at[slot])

            def read_back_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    grads3d_hbm.at[kt + chunk_idx], gout.at[slot],
                    osem.at[slot])

            # single REVERSE sweep: k = 0..n_chunks-1 processes ci = last..0
            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, n_chunks - 1).start()

            def sweep(k, s_carry):
                ci = n_chunks - 1 - k

                @pl.when(ci >= 1)
                def _():
                    get_dma((k + 1) % 2, ci - 1).start()

                t_start = fetch_boundary(off, ci)
                # boundary all-zero <=> the forward's early exit never
                # started this chunk: its instances contributed < TRANS_EPS
                started = jnp.max(t_start) > 0.0

                get_dma(k % 2, ci).wait()
                blk = buf[k % 2]
                gblk, chunk_total = chunk_grads(
                    blk, px, py, lane, p6, ox, oy, fields,
                    (kt + ci) * CHUNK, start, count, t_start,
                    suffix=s_carry, suffix_is_remainder=False)

                oslot = k % 2
                # lowest-address chunk may share rows with the previous
                # tile's tail (flushed earlier — the grid is sequential):
                # accumulate
                is_boundary = (ci == 0) & (kt * CHUNK < start)

                @pl.when(started & is_boundary)
                def _():
                    read_back_dma(oslot, ci).start()
                    read_back_dma(oslot, ci).wait()
                    gout[oslot] = gout[oslot] + gblk

                @pl.when(started & ~is_boundary)
                def _():
                    gout[oslot] = gblk

                @pl.when(started)
                def _():
                    put_dma(oslot, ci).start()
                    put_dma(oslot, ci).wait()

                return s_carry + jnp.where(started, chunk_total, 0.0)

            jax.lax.fori_loop(0, n_chunks, sweep,
                              jnp.zeros((p, 1), jnp.float32))

        def one_tile_vmem(t, sbuf, gspan, k0c):
            i, ox, oy, fields = tile_fields(t)
            start = start_ref[i]
            count = count_ref[i]
            off = off_ref[i]
            kt = start // CHUNK
            n_chunks = (start - kt * CHUNK + count + CHUNK - 1) // CHUNK

            def sweep(k, s_carry):
                ci = n_chunks - 1 - k
                t_start = fetch_boundary(off, ci)
                started = jnp.max(t_start) > 0.0
                rel = kt - k0c + ci
                blk = sbuf[rel]
                gblk, chunk_total = chunk_grads(
                    blk, px, py, lane, p6, ox, oy, fields,
                    (kt + ci) * CHUNK, start, count, t_start,
                    suffix=s_carry, suffix_is_remainder=False)

                # same left-to-right accumulation order as the HBM
                # read-modify-write path: earlier tiles' blocks (already in
                # gspan, read back from HBM or added by this program) come
                # first in the sum
                @pl.when(started)
                def _():
                    gspan[rel] = gspan[rel] + gblk

                return s_carry + jnp.where(started, chunk_total, 0.0)

            jax.lax.fori_loop(0, n_chunks, sweep,
                              jnp.zeros((p, 1), jnp.float32))

        if span_cap and tpp > 1:
            sbuf, gspan, ssem, gssem = span_scratch
            last = i0 + tpp - 1
            k0 = start_ref[i0] // CHUNK
            k_end = (start_ref[last] + count_ref[last]
                     + CHUNK - 1) // CHUNK                   # exclusive
            k0c = jnp.minimum(k0, rows3d_hbm.shape[0] - span_cap)
            fits = (k_end - k0c) <= span_cap

            rows_rd = pltpu.make_async_copy(
                rows3d_hbm.at[pl.ds(k0c, span_cap)], sbuf, ssem)
            grads_rd = pltpu.make_async_copy(
                grads3d_hbm.at[pl.ds(k0c, span_cap)], gspan, gssem)
            grads_wr = pltpu.make_async_copy(
                gspan, grads3d_hbm.at[pl.ds(k0c, span_cap)], gssem)

            @pl.when(fits)
            def _():
                rows_rd.start()
                grads_rd.start()
                rows_rd.wait()
                grads_rd.wait()
                for t in range(tpp):
                    one_tile_vmem(t, sbuf, gspan, k0c)
                # untouched chunks in the window are written back with the
                # values just read (the grid is sequential, so nothing can
                # have written them in between)
                grads_wr.start()
                grads_wr.wait()

            @pl.when(~fits)
            def _():
                for t in range(tpp):
                    one_tile_dma(t)
        else:
            for t in range(tpp):
                one_tile_dma(t)

    return kernel


def _run_backward(packed: PackedTiles, gimg_t: jnp.ndarray,
                  tbounds: jnp.ndarray, width: int, height: int,
                  tile_size: int, bg: tuple[float, float, float],
                  interpret: bool,
                  tiles_per_program: int | None = None,
                  span_cap: int | None = None) -> jnp.ndarray:
    """Returns per-instance grads, param-major [16, B_pad]."""
    tw, th = width // tile_size, height // tile_size
    n_tiles = tw * th
    p = tile_size * tile_size
    b_pad = packed.rows16.shape[1]
    offsets, _ = chunk_layout(packed, n_tiles)

    if tiles_per_program is None or n_tiles % tiles_per_program:
        tiles_per_program = 1
    tpp = tiles_per_program
    if span_cap is None or tpp == 1:
        span_cap = 0

    n_chunks_arr = b_pad // CHUNK
    span_cap = min(span_cap, n_chunks_arr)
    rows3d = packed.rows16.reshape(PACK16, n_chunks_arr, CHUNK)
    rows3d = rows3d.transpose(1, 0, 2)

    if span_cap:
        # span fast path keeps the reverse-sweep kernel (its per-program
        # VMEM gradient window already avoids the per-chunk RMW waits)
        kernel = _bwd_kernel(tile_size, tw, bg, tpp, span_cap)
        scratch_shapes = [
            pltpu.VMEM((2, PACK16, CHUNK), jnp.float32),
            pltpu.VMEM((p, CHUNK), jnp.float32),
            pltpu.VMEM((2, PACK16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((span_cap, PACK16, CHUNK), jnp.float32),
            pltpu.VMEM((span_cap, PACK16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        # production path: forward-order sweep, rolling chunk accumulator
        kernel = _bwd_kernel_fwd_order(tile_size, tw, bg, n_tiles // tpp, tpp)
        scratch_shapes = [
            pltpu.VMEM((2, PACK16, CHUNK), jnp.float32),    # row chunks
            pltpu.VMEM((p, CHUNK), jnp.float32),            # boundary group
            pltpu.VMEM((2, PACK16, CHUNK), jnp.float32),    # grad accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((5,), jnp.int32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles // tpp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # rows3d
            pl.BlockSpec((tpp, p, GCH), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # grad images
            pl.BlockSpec(memory_space=pl.ANY),                 # tbounds
            pl.BlockSpec(memory_space=pl.ANY),                 # grads in/out
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=scratch_shapes,
    )

    zeros = jnp.zeros((n_chunks_arr, PACK16, CHUNK), jnp.float32)
    (grads3d,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks_arr, PACK16, CHUNK),
                                        jnp.float32)],
        # aliases index ALL inputs incl. scalar-prefetch: the zeros buffer
        # (input 6) IS the output, so untouched regions stay zero
        input_output_aliases={6: 0},
        interpret=interpret,
    )(packed.starts, packed.counts, offsets, rows3d, gimg_t, tbounds,
      zeros)
    return grads3d.transpose(1, 0, 2).reshape(PACK16, b_pad)


def _images_to_tiles(img: jnp.ndarray, width: int, height: int,
                     tile_size: int) -> jnp.ndarray:
    """[C, H, W] -> [n_tiles, p, C] (pixel-major per tile)."""
    c = img.shape[0]
    tw, th = width // tile_size, height // tile_size
    t = img.reshape(c, th, tile_size, tw, tile_size)
    t = t.transpose(1, 3, 2, 4, 0).reshape(th * tw, tile_size * tile_size, c)
    return t


@functools.lru_cache(maxsize=32)
def make_pallas_renderer(width: int, height: int,
                         bg_static: tuple[float, float, float],
                         tile_size: int = 16, win: int = 5,
                         big_cap: int | None = None,
                         interpret: bool = False,
                         tiles_per_program: int | None = None,
                         span_cap: int | None = None,
                         pack_order: str = "exact"):
    """A differentiable rasterizer closure with a Pallas forward AND
    backward. Returns fn(xy, depth, conic, color, opacity, valid, power_cut,
    radius) -> (rgb, depth_img, alpha_img)."""
    tw, th = width // tile_size, height // tile_size

    def _pack(xy, depth, conic, color, opacity, valid, power_cut, radius):
        proj = ProjectedGaussians(xy=xy, depth=depth, conic=conic,
                                  radius=radius, color=color, opacity=opacity,
                                  valid=valid, power_cut=power_cut)
        return sorted_pack(proj, tw, th, tile_size, win, big_cap=big_cap,
                           order=pack_order)

    @jax.custom_vjp
    def raster(xy, depth, conic, color, opacity, valid, power_cut, radius):
        packed = _pack(xy, depth, conic, color, opacity, valid, power_cut,
                       radius)
        out_t = raster_forward_tiles(packed, width, height, tile_size,
                                     bg_static, interpret)
        return tiles_to_images(out_t, width, height, tile_size)

    def fwd(xy, depth, conic, color, opacity, valid, power_cut, radius):
        packed = _pack(xy, depth, conic, color, opacity, valid, power_cut,
                       radius)
        out_t, tbounds = raster_forward_train(
            packed, width, height, tile_size, bg_static, interpret,
            tiles_per_program=tiles_per_program, span_cap=span_cap)
        images = tiles_to_images(out_t, width, height, tile_size)
        n = xy.shape[0]
        return images, (packed, images, tbounds, n)

    def bwd(res, cots):
        packed, images, tbounds, n = res
        rgb, dep, acc = images
        g_rgb, g_dep, g_acc = cots
        # U_tot = sum_i u_i w_i per pixel, in closed form from the forward
        # outputs (out_c = sum_i c_i a_i T_i + bg_c T_N): lets the backward
        # kernel walk chunks in FORWARD order (suffix = U_tot - prefix) —
        # see _bwd_kernel_fwd_order.
        t_fin = 1.0 - acc
        u_tot = (g_rgb[0:1] * (rgb[0:1] - bg_static[0] * t_fin)
                 + g_rgb[1:2] * (rgb[1:2] - bg_static[1] * t_fin)
                 + g_rgb[2:3] * (rgb[2:3] - bg_static[2] * t_fin)
                 + g_dep * dep)
        gimg = jnp.concatenate(
            [g_rgb, g_dep, g_acc, acc, u_tot,
             jnp.zeros((GCH - 7, height, width), jnp.float32)], axis=0)
        gimg_t = _images_to_tiles(gimg, width, height, tile_size)
        grads16 = _run_backward(packed, gimg_t, tbounds, width, height,
                                tile_size, bg_static, interpret,
                                tiles_per_program=tiles_per_program,
                                span_cap=span_cap)
        # reduce instances -> gaussians (sentinel id n catches dead slots)
        per_inst = grads16.T                                  # [B_pad, 16]
        per_gauss = jax.ops.segment_sum(
            per_inst, packed.gauss_idx, num_segments=n + 1)[:n]
        d_xy = per_gauss[:, 0:2]
        d_conic = per_gauss[:, 2:5]
        d_color = per_gauss[:, 5:8]
        d_op = per_gauss[:, 8]
        d_depth = per_gauss[:, 9]
        return (d_xy, d_depth, d_conic, d_color, d_op, None, None, None)

    raster.defvjp(fwd, bwd)
    return raster


def rasterize_pallas_grad(proj: ProjectedGaussians, width: int, height: int,
                          bg_static: tuple[float, float, float],
                          tile_size: int | None = None, win: int | None = None,
                          big_cap: int | None = None,
                          interpret: bool = False,
                          tiles_per_program: int | None = None,
                          span_cap: int | None = None,
                          pack_order: str = "exact"):
    """Differentiable Pallas rasterization of a ProjectedGaussians bundle.

    Gradients flow to xy, depth, conic, color and opacity; radius/valid/
    power_cut are treated as non-differentiable (they gate support, matching
    the CUDA kernel which takes no gradient through its tile bounds).

    ``tile_size=None`` auto-selects like the serving tier (32px tiles for
    frames >= 512px): at training scale the tile grid is sparsely occupied,
    so the 4x fewer per-tile programs dominate the extra per-pixel work in
    BOTH the forward and the reverse-sweep backward kernel.
    """
    if tile_size is None:
        tile_size = 32 if (width % 32 == 0 and height % 32 == 0
                           and min(width, height) >= 512) else 16
    if win is None:
        win = 5 if tile_size == 16 else 3
    fn = make_pallas_renderer(width, height, bg_static, tile_size, win,
                              big_cap, interpret, tiles_per_program, span_cap,
                              pack_order)
    return fn(proj.xy, proj.depth, proj.conic, proj.color, proj.opacity,
              proj.valid, proj.power_cut, proj.radius)
