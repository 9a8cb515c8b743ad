"""Slow-but-exact splatting oracle: every Gaussian vs every pixel.

Used as the numeric ground truth for the tiled/Pallas kernels and as the
renderer for tiny test scenes. Materializes [N, P] alpha maps, so keep
N * H * W modest (tests use <= 2k Gaussians at <= 256^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cloth_splatting_tpu.ops.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    ProjectedGaussians,
)


def rasterize_reference(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite projected Gaussians front-to-back at every pixel.

    Returns:
        rgb [3, H, W], depth [1, H, W] (alpha-weighted expected depth),
        alpha [1, H, W] (accumulated opacity).
    """
    n = proj.xy.shape[0]
    order = jnp.argsort(proj.depth)  # invalid have depth=inf -> last
    xy = proj.xy[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = proj.opacity[order]
    depth = jnp.where(jnp.isfinite(proj.depth[order]), proj.depth[order], 0.0)
    valid = proj.valid[order]
    power_cut = proj.power_cut[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(xy.dtype)  # [P, 2]

    d = pix[None, :, :] - xy[:, None, :]                  # [N, P, 2]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (
        a[:, None] * d[..., 0] ** 2 + c[:, None] * d[..., 1] ** 2
    ) - b[:, None] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))    # [N, P]
    alpha = jnp.where((power > 0.0) | (power < power_cut[:, None]), 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    alpha = jnp.where(valid[:, None], alpha, 0.0)

    # Exclusive prefix product of (1 - alpha) down the depth order.
    one_minus = 1.0 - alpha
    trans = jnp.concatenate(
        [jnp.ones((1, alpha.shape[1]), alpha.dtype), jnp.cumprod(one_minus, axis=0)[:-1]],
        axis=0,
    )                                                     # [N, P]
    w = trans * alpha                                     # compositing weights
    # HIGHEST: on TPU the default einsum precision is bf16 passes, which
    # would put ~3e-3 of error in the ground truth itself.
    rgb = jnp.einsum("np,nc->cp", w, color,
                     precision=jax.lax.Precision.HIGHEST)
    dep = jnp.einsum("np,n->p", w, depth,
                     precision=jax.lax.Precision.HIGHEST)
    acc = jnp.sum(w, axis=0)
    t_final = jnp.prod(one_minus, axis=0)
    rgb = rgb + t_final[None, :] * bg_color[:, None]

    return (
        rgb.reshape(3, height, width),
        dep.reshape(1, height, width),
        acc.reshape(1, height, width),
    )
