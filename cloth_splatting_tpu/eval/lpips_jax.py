"""LPIPS perceptual distance in JAX (VGG16 backbone + learned linear heads).

Architecture parity with the reference's vendored lpipsPyTorch
(lpipsPyTorch/modules/lpips.py:8-36 + networks.py): scale inputs with the
ImageNet shift/scale, run VGG16 conv features at the 5 standard taps
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), unit-normalize channels,
weight squared differences with the learned 1x1 linear heads, spatial-mean
and sum over taps.

This environment has no network egress and no bundled pretrained weights, so
two weight sources exist:

  * real LPIPS-vgg weights from an .npz exported by
    ``scripts/export_lpips_weights.py`` (run anywhere with torch+lpips and
    point --lpips_weights at the file) — numbers comparable to published
    LPIPS;
  * ``fixture_weights()`` — a DETERMINISTIC He-initialized VGG with uniform
    linear heads (seeded, identical on every machine/run). Fixture numbers
    are a valid perceptual-distance *metric* (monotone in feature-space
    distortion, 0 for identical images) and reproducible for regression
    tracking within this framework, but are NOT comparable to published
    LPIPS values; metrics.py labels them ``lpips_weights: fixture-v1``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per block
VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def load_weights(path: str) -> dict:
    """Load {'conv_<b>_<i>_w'/'_b', 'lin_<b>'} arrays from npz.

    conv weights are [kh, kw, cin, cout] (HWIO); lin weights are [c].
    """
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def available(path: str | None) -> bool:
    return bool(path) and os.path.exists(path)


FIXTURE_VERSION = "fixture-v1"


def fixture_weights(seed: int = 0) -> dict:
    """Deterministic He-initialized VGG16 + uniform linear heads.

    Bit-identical across machines for a given seed (one
    ``np.random.default_rng`` stream in a fixed key order), so fixture-LPIPS
    values are stable regression metrics even though they are not comparable
    to published (pretrained) LPIPS numbers.
    """
    rng = np.random.default_rng(seed)
    weights: dict[str, np.ndarray] = {}
    cin = 3
    for b, (cout, n_convs) in enumerate(VGG_BLOCKS):
        for i in range(n_convs):
            fan_in = 3 * 3 * cin
            std = np.sqrt(2.0 / fan_in)
            weights[f"conv_{b}_{i}_w"] = rng.normal(
                0.0, std, (3, 3, cin, cout)).astype(np.float32)
            weights[f"conv_{b}_{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
        weights[f"lin_{b}"] = np.full(cout, 1.0 / cout, np.float32)
    return weights


def _vgg_features(weights: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: [B, 3, H, W] in [-1, 1] -> list of 5 feature maps."""
    x = (x - jnp.asarray(SHIFT)[None, :, None, None]) / \
        jnp.asarray(SCALE)[None, :, None, None]
    feats = []
    h = x
    for b, (_, n_convs) in enumerate(VGG_BLOCKS):
        for i in range(n_convs):
            w = weights[f"conv_{b}_{i}_w"]
            bias = weights[f"conv_{b}_{i}_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
            ) + bias[None, :, None, None]
            h = jax.nn.relu(h)
        feats.append(h)
        if b < len(VGG_BLOCKS) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return feats


def lpips(weights: dict, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between [B, 3, H, W] images in [0, 1]."""
    x = img1 * 2.0 - 1.0
    y = img2 * 2.0 - 1.0
    fx = _vgg_features(weights, x)
    fy = _vgg_features(weights, y)
    total = 0.0
    for b, (a, c) in enumerate(zip(fx, fy)):
        an = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
        cn = c / jnp.sqrt(jnp.sum(c**2, axis=1, keepdims=True) + 1e-10)
        d = (an - cn) ** 2                                    # [B, C, H, W]
        lin = weights[f"lin_{b}"]                             # [C]
        total = total + jnp.mean(
            jnp.sum(d * lin[None, :, None, None], axis=1), axis=(1, 2))
    return total
