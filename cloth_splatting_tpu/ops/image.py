"""Pixel-space losses and metrics (L1/L2/PSNR), parity with reference utils."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean absolute error; optional multiplicative mask
    (reference: utils/loss_utils.py:20-23)."""
    diff = jnp.abs(pred - gt)
    if mask is not None:
        diff = diff * mask
    return jnp.mean(diff)


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE over (C, H, W), keeping batch dims
    (reference: utils/image_utils.py:14-15)."""
    return jnp.mean((pred - gt) ** 2, axis=(-3, -2, -1), keepdims=False)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio per image in dB
    (reference: utils/image_utils.py:17-19)."""
    m = mse(pred, gt)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-12)))


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))
