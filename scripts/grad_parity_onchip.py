#!/usr/bin/env python
"""On-chip gradient parity at realistic occupancy (ADVICE r4 medium #1).

The default (round-4) backward kernel sweeps tiles in FORWARD order and
derives each instance's occlusion suffix as ``S_i = U_tot - prefix_i`` — a
signed subtraction of two large accumulated sums. For deeply occupied tiles
(100+ instances, several 128-wide chunks) that subtraction can cancel
catastrophically, corrupting the ``(kk - S_i)/(1 - alpha)`` term for late
instances. Until round 5 it was only validated in interpret mode on tiny
scenes at a scaled 1e-5 tolerance.

This script builds a DENSE synthetic bundle (~170 instances/tile mean, deep
high-alpha stacks -> multi-chunk tiles, large U_tot) and compares, ON CHIP:

  * fwd   : the default forward-order backward (tiles_per_program=1),
  * span  : the reverse-sweep backward (span fast path, tpp>1 + span_cap),
  * dense : the XLA-autodiff dense tiled tier (oracle, uncapped).

Reports per-field max relative error for fwd-vs-dense, span-vs-dense and
fwd-vs-span. Prints one JSON line. Runs in ~1 min on chip (CPU interpret
works too, slower).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--k_cap", type=int, default=2048,
                   help="dense-oracle per-tile cap; must not drop instances")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.ops.projection import ProjectedGaussians
    from cloth_splatting_tpu.ops.rasterize import rasterize_tiled
    from cloth_splatting_tpu.ops.rasterize.pallas_train import (
        rasterize_pallas_grad,
    )

    w = h = args.size
    n = args.n
    rng = np.random.default_rng(args.seed)
    xy = jnp.asarray(rng.uniform(4, w - 4, (n, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 6.0, n), jnp.float32)
    # radii under the small-stream span so the dense tier is an exact
    # semantic match (same contract as TestMultiGroupBoundaries)
    inv = 1.0 / rng.uniform(2.0, 6.0, n).astype(np.float32)
    conic = jnp.stack(
        [jnp.asarray(inv), jnp.zeros(n, jnp.float32), jnp.asarray(inv)],
        axis=1)
    # heavy-alpha mix: the cancellation risk grows with accumulated sums,
    # so most instances are near-opaque (deep saturated stacks)
    op = np.where(rng.uniform(size=n) < 0.7,
                  rng.uniform(0.6, 0.95, n), rng.uniform(0.05, 0.3, n))
    proj = ProjectedGaussians(
        xy=xy, depth=depth, conic=conic,
        radius=jnp.asarray(3.0 / np.sqrt(inv), jnp.float32),
        color=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        opacity=jnp.asarray(op, jnp.float32),
        valid=jnp.ones((n,), bool),
        power_cut=jnp.full((n,), -4.5, jnp.float32),
    )
    tgt = jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32)
    interp = jax.default_backend() == "cpu"

    def loss_dense(xy, conic, color, op):
        pr = proj._replace(xy=xy, conic=conic, color=color, opacity=op)
        rgb, dep, acc, aux = rasterize_tiled(pr, w, h, jnp.ones(3),
                                             k_cap=args.k_cap)
        return (jnp.mean((rgb - tgt) ** 2) + 0.05 * jnp.mean(acc),
                aux.n_dropped)

    def make_loss_pallas(tpp, span_cap):
        def f(xy, conic, color, op):
            pr = proj._replace(xy=xy, conic=conic, color=color, opacity=op)
            rgb, dep, acc = rasterize_pallas_grad(
                pr, w, h, (1.0, 1.0, 1.0), tile_size=16, win=5,
                interpret=interp, tiles_per_program=tpp, span_cap=span_cap)
            return jnp.mean((rgb - tgt) ** 2) + 0.05 * jnp.mean(acc)
        return f

    xs = (proj.xy, proj.conic, proj.color, proj.opacity)
    (l_d, dropped), g_dense = jax.jit(jax.value_and_grad(
        loss_dense, argnums=(0, 1, 2, 3), has_aux=True))(*xs)
    assert int(dropped) == 0, f"raise --k_cap: dense dropped {int(dropped)}"
    l_f, g_fwd = jax.jit(jax.value_and_grad(
        make_loss_pallas(None, None), argnums=(0, 1, 2, 3)))(*xs)
    l_s, g_span = jax.jit(jax.value_and_grad(
        make_loss_pallas(4, 16), argnums=(0, 1, 2, 3)))(*xs)

    fields = ("xy", "conic", "color", "opacity")

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-12
        return float(np.abs(a - b).max() / scale)

    out = {
        "metric": "grad_parity_onchip",
        "backend": jax.default_backend(),
        "n": n, "size": args.size,
        "loss_dense": float(l_d), "loss_fwd": float(l_f),
        "loss_span": float(l_s),
        "finite_fwd": bool(all(np.all(np.isfinite(np.asarray(g)))
                               for g in g_fwd)),
        "finite_span": bool(all(np.all(np.isfinite(np.asarray(g)))
                                for g in g_span)),
    }
    for name, gd, gf, gs in zip(fields, g_dense, g_fwd, g_span):
        out[f"rel_fwd_dense_{name}"] = rel(gf, gd)
        out[f"rel_span_dense_{name}"] = rel(gs, gd)
        out[f"rel_fwd_span_{name}"] = rel(gf, gs)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
