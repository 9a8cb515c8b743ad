#!/usr/bin/env python
"""Compile + numeric smoke of the custom-VJP Pallas rasterizer on real TPU.

Regression for the Mosaic lane-alignment failure of the saved-boundary
layout (tbounds [bound, p, 1] -> [bound, 1, p]): build a dense random scene
at 800x800 (32px tiles, p=1024) and 400x400 (16px tiles, p=256), run
value_and_grad through rasterize_pallas_grad, and assert finite outputs.
"""
import sys

import jax
import jax.numpy as jnp

from cloth_splatting_tpu.ops.projection import ProjectedGaussians
from cloth_splatting_tpu.ops.rasterize.pallas_train import rasterize_pallas_grad


def run(width, height, n):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    xy = jax.random.uniform(ks[0], (n, 2)) * jnp.array([width, height])
    depth = jax.random.uniform(ks[1], (n,)) * 5.0 + 1.0
    # conic from random isotropic-ish scales
    s = jax.random.uniform(ks[2], (n,)) * 6.0 + 2.0
    inv = 1.0 / (s * s)
    conic = jnp.stack([inv, jnp.zeros_like(inv), inv], axis=1)
    color = jax.random.uniform(ks[3], (n, 3))
    opacity = jax.random.uniform(ks[4], (n,)) * 0.9 + 0.05
    valid = jnp.ones((n,), bool)
    power_cut = jnp.full((n,), -8.0)
    radius = s * 3.0

    def loss(xy, depth, conic, color, opacity):
        proj = ProjectedGaussians(xy=xy, depth=depth, conic=conic,
                                  radius=radius, color=color, opacity=opacity,
                                  valid=valid, power_cut=power_cut)
        rgb, dep, acc = rasterize_pallas_grad(proj, width, height,
                                              (1.0, 1.0, 1.0))
        return jnp.sum(rgb * rgb) + jnp.sum(dep) + jnp.sum(acc)

    v, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))(
        xy, depth, conic, color, opacity)
    ok = bool(jnp.isfinite(v)) and all(
        bool(jnp.all(jnp.isfinite(g))) for g in grads)
    gn = [float(jnp.abs(g).sum()) for g in grads]
    print(f"{width}x{height} n={n}: loss={float(v):.4f} finite={ok} "
          f"grad_l1={gn}")
    return ok


def main():
    print("platform:", jax.devices()[0].platform)
    ok1 = run(800, 800, 20000)
    ok2 = run(400, 400, 8000)
    if not (ok1 and ok2):
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
