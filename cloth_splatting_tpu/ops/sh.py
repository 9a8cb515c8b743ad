"""Real spherical-harmonics evaluation (degrees 0..4).

Behavioral parity with the reference SH path (reference: utils/sh_utils.py:57-118,
PlenOctree constants). The rasterizer consumes per-Gaussian SH coefficient stacks
[N, (deg+1)^2, 3] and view directions [N, 3]; evaluation is a single fused
einsum-style contraction so XLA maps it onto the VPU/MXU without gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

# Real SH basis constants (standard normalization, identical to PlenOctree's).
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis functions at unit directions.

    Args:
        deg: maximum SH degree, 0..4 (static).
        dirs: [..., 3] unit direction vectors.

    Returns:
        [..., (deg+1)**2] basis values such that
        ``color = sum_k basis[..., k] * sh[..., k, :]``.
    """
    if not 0 <= deg <= 4:
        raise ValueError(f"SH degree must be in [0, 4], got {deg}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if deg >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg >= 3:
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if deg >= 4:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors.

    Args:
        deg: active SH degree (static int).
        sh: [..., K, C] SH coefficients with K >= (deg+1)**2 (K is the storage
            size for max degree; only the first (deg+1)**2 are used).
        dirs: [..., 3] unit view directions.

    Returns:
        [..., C] evaluated values (add 0.5 and clamp externally for RGB).
    """
    ncoef = (deg + 1) ** 2
    basis = sh_basis(deg, dirs)  # [..., ncoef]
    # expanded sum instead of a batched einsum (see ops/smallmat.py rationale)
    out = basis[..., 0:1] * sh[..., 0, :]
    for k in range(1, ncoef):
        out = out + basis[..., k:k + 1] * sh[..., k, :]
    return out


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert an RGB albedo into the DC SH coefficient."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """Convert a DC SH coefficient back into RGB."""
    return sh * C0 + 0.5
