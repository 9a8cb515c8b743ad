"""SSIM with an 11x11 Gaussian window (sigma=1.5), differentiable.

Numerically matches the reference implementation (utils/loss_utils.py:28-70):
same window, same reflection-free zero ("same") padding via conv with
padding=window//2, same C1/C2 constants.

TPU mapping: a depthwise 1-channel 11-tap conv is a worst case for the MXU
(the systolic array wants wide channel dims; XLA pads C=1 to the lane width
and wastes >100x). The separable blur is instead expressed as two dense
banded-matrix matmuls ([..., H, W] x [W, W] then [H, H] contraction) — 72x
more MACs than the taps but they run at full MXU rate: measured 44 ms ->
~4 ms of a 3-camera 800x800 train step (fwd+bwd) vs the conv formulation.
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


@functools.lru_cache(maxsize=32)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """[n, n] banded matrix B with B[m, i] = k[m - i + pad]: right-multiplying
    ``img @ B`` equals the 1-D conv with zero 'same' padding (edge rows of
    the band are truncated, exactly the conv's zero-padding semantics)."""
    k = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    band = np.zeros((n, n), np.float32)
    for j, kv in enumerate(k):
        off = j - pad
        idx = np.arange(max(0, -off), min(n, n - off))
        band[idx + off, idx] = kv
    return band


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of [B, C, H, W] with zero 'same' padding,
    as two MXU matmuls."""
    h, w = img.shape[-2], img.shape[-1]
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    x = jax.lax.dot_general(img, bw, (((img.ndim - 1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    # blur along H: contract the H axis (now axis -2) with bh
    x = jnp.moveaxis(
        jax.lax.dot_general(x, bh, (((img.ndim - 2,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST),
        -1, -2)
    return x


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
