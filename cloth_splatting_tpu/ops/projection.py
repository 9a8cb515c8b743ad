"""EWA splatting projection: 3D Gaussians -> screen-space 2D Gaussians.

This is the shared front half of every renderer tier (jnp oracle, tiled XLA,
Pallas). It reproduces the geometry of the CUDA rasterizer the reference
depends on (behavioral contract documented at SURVEY.md section 2.1 and
gaussian_renderer/__init__.py:61-164): camera-space transform, perspective
Jacobian, 2D covariance J W S W^T J^T with +0.3 pixel low-pass on the
diagonal, conic inverse, 3-sigma radius from the max eigenvalue, near-plane
cull at z<=0.2, and alpha = opacity * exp(-0.5 d^T conic d) clamped at 0.99
with a 1/255 contribution floor.

Everything is fully batched [N, ...] with no data-dependent shapes, so XLA
fuses it into a handful of elementwise ops + one small matmul chain on the
MXU. Differentiable end-to-end by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cloth_splatting_tpu.ops.quaternion import quat_to_rotmat

NEAR_CULL_Z = 0.2
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
# Explicit 3-sigma Mahalanobis support cutoff. The CUDA rasterizer implicitly
# clips each splat to the tiles covered by its 3-sigma rect; we make the
# cutoff a deterministic per-pixel rule (power < power_cut => zero) so every
# renderer tier computes the identical image regardless of tiling.
POWER_CUTOFF = -4.5
# Hard cap on screen radius. Splats larger than this get their support ellipse
# shrunk proportionally (power_cut scaled) so it still fits the binning rect.
# The training pipeline prunes Gaussians with screen radius > 20 px anyway
# (reference: gaussian_model.py:408-416, size_threshold=20).
MAX_SPLAT_RADIUS = 32.0


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians ready for compositing.

    All arrays are [N, ...]; ``valid`` marks Gaussians that survived frustum
    culling AND the caller's alive mask. Invalid entries have radius 0.
    """

    xy: jnp.ndarray        # [N, 2] pixel-space means
    depth: jnp.ndarray     # [N] camera-space z (sorting key)
    conic: jnp.ndarray     # [N, 3] upper-triangular inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # [N] screen radius in pixels (<= MAX_SPLAT_RADIUS)
    color: jnp.ndarray     # [N, 3] view-dependent RGB (SH already evaluated)
    opacity: jnp.ndarray   # [N] activated opacity in [0, 1]
    valid: jnp.ndarray     # [N] bool
    power_cut: jnp.ndarray  # [N] per-Gaussian support cutoff (<= 0)


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray,
                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """Full 3D covariance [N, 3, 3] from activated scales and WXYZ quaternions.

    Sigma = R S S^T R^T (reference contract: utils/general_utils.py:104-113 +
    gaussian_model.py:28-37).
    """
    R = quat_to_rotmat(quats)                      # [N, 3, 3]
    S = scales * scale_modifier                    # [N, 3]
    RS = R * S[:, None, :]                         # R @ diag(S)
    return jnp.einsum("nij,nkj->nik", RS, RS)      # RS @ RS^T


def covariance_strip(cov: jnp.ndarray) -> jnp.ndarray:
    """Symmetric [N, 3, 3] -> packed upper triangle [N, 6] (3DGS PLY layout)."""
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2], cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=-1,
    )


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    width: int,
    height: int,
    tanfovx: float,
    tanfovy: float,
    alive: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project 3D Gaussians into screen space (EWA).

    Args:
        means3d: [N, 3] world positions.
        cov3d: [N, 3, 3] world-space covariance.
        colors: [N, 3] RGB colors (post-SH).
        opacities: [N] activated opacity.
        world_view: [4, 4] row-vector W2C (camera.world_view).
        full_proj: [4, 4] row-vector W2C @ P (camera.full_proj).
        width, height: image size (static).
        tanfovx, tanfovy: half-FoV tangents.
        alive: optional [N] bool mask for capacity-padded fields.
    """
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), dtype=means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)

    # Camera space (row-vector convention).
    t_cam = hom @ world_view            # [N, 4]
    tz = t_cam[:, 2]

    # Clip space -> NDC -> pixels.
    p_hom = hom @ full_proj             # [N, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    px = (ndc[:, 0] + 1.0) * width * 0.5 - 0.5
    py = (ndc[:, 1] + 1.0) * height * 0.5 - 0.5
    xy = jnp.stack([px, py], axis=-1)

    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # Perspective Jacobian with the CUDA rasterizer's frustum clamp.
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    txtz = jnp.clip(t_cam[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(t_cam[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J: [N, 2, 3]
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1),
            jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    W = world_view[:3, :3].T            # rotation part, column-vector form
    T = jnp.einsum("nij,jk->nik", J, W)  # [N, 2, 3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", T, cov3d, T)  # [N, 2, 2]

    # Low-pass: splat at least ~1 px (the rasterizer's +0.3 on the diagonal).
    c00 = cov2d[:, 0, 0] + 0.3
    c01 = cov2d[:, 0, 1]
    c11 = cov2d[:, 1, 1] + 0.3

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    # 3-sigma radius from max eigenvalue of the 2D covariance, capped so the
    # support always fits a bounded tile rect (power_cut shrinks the ellipse
    # of oversized splats proportionally).
    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_raw = jnp.ceil(3.0 * jnp.sqrt(lambda1))
    radius = jnp.minimum(radius_raw, MAX_SPLAT_RADIUS)
    power_cut = POWER_CUTOFF * (radius / jnp.maximum(radius_raw, 1.0)) ** 2

    valid = (tz > NEAR_CULL_Z) & (det > 0.0)
    # On-screen test: a gaussian whose disc misses the image contributes nothing.
    on_screen = (
        (px + radius > 0.0)
        & (px - radius < width)
        & (py + radius > 0.0)
        & (py - radius < height)
    )
    valid = valid & on_screen
    if alive is not None:
        valid = valid & alive

    radius = jnp.where(valid, radius, 0.0)
    depth = jnp.where(valid, tz, jnp.inf)

    return ProjectedGaussians(
        xy=xy,
        depth=depth,
        conic=conic,
        radius=radius,
        color=colors,
        opacity=opacities,
        valid=valid,
        power_cut=power_cut,
    )
