"""SSIM with an 11x11 Gaussian window (sigma=1.5), differentiable.

Numerically matches the reference implementation (utils/loss_utils.py:28-70):
same window, same reflection-free zero ("same") padding via conv with
padding=window//2, same C1/C2 constants. Implemented as two separable 1-D
depthwise convolutions so XLA fuses it into a couple of small convs that run
on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return g.astype(np.float32)


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian blur of [B, C, H, W] with zero 'same' padding."""
    b, c, h, w = img.shape
    k = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2
    kernel_h = k.reshape(1, 1, window_size, 1)
    kernel_w = k.reshape(1, 1, 1, window_size)
    dn = jax.lax.conv_dimension_numbers(img.shape, (1, 1, window_size, 1), ("NCHW", "OIHW", "NCHW"))
    x = img.reshape(b * c, 1, h, w)
    x = jax.lax.conv_general_dilated(x, kernel_h, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kernel_w, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x.reshape(b, c, h, w)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, return_map: bool = False) -> jnp.ndarray:
    """Structural similarity for image batches.

    Args:
        img1, img2: [..., C, H, W] images in [0, 1].
        return_map: if True returns the per-pixel SSIM map instead of the mean.
    """
    orig_shape = img1.shape
    img1 = img1.reshape((-1,) + orig_shape[-3:])
    img2 = img2.reshape((-1,) + orig_shape[-3:])

    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    ssim_map = ssim_map.reshape(orig_shape)
    if return_map:
        return ssim_map
    return jnp.mean(ssim_map)
