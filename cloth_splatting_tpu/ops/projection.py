"""EWA splatting projection: 3D Gaussians -> screen-space 2D Gaussians.

This is the shared front half of every renderer tier (jnp oracle, tiled XLA,
Pallas). It reproduces the geometry of the CUDA rasterizer the reference
depends on (behavioral contract documented at SURVEY.md section 2.1 and
gaussian_renderer/__init__.py:61-164): camera-space transform, perspective
Jacobian, 2D covariance J W S W^T J^T with +0.3 pixel low-pass on the
diagonal, conic inverse, 3-sigma radius from the max eigenvalue, near-plane
cull at z<=0.2, and alpha = opacity * exp(-0.5 d^T conic d) clamped at 0.99
with a 1/255 contribution floor.

All small-matrix algebra is elementwise-expanded (ops/smallmat.py): XLA's
batched-tiny-matmul lowering is pathological on TPU, and the expansions fuse
into one VPU kernel. Covariances travel PACKED as [N, 6] upper triangles.
Everything is [N]-batched with no data-dependent shapes; differentiable
end-to-end by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.ops.quaternion import quat_to_rotmat
from cloth_splatting_tpu.ops.smallmat import (
    affine4_shared,
    sym33_from_rs,
    sym33_quadform2,
)

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
MAX_SPLAT_RADIUS = 24.0


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
    """Packed 3D covariance [N, 6] (xx, xy, xz, yy, yz, zz) from activated
    scales and WXYZ quaternions.

    Sigma = R S S^T R^T (reference contract: utils/general_utils.py:104-113 +
    gaussian_model.py:28-37), expanded elementwise.
    """
    r = quat_to_rotmat(quats)
    s2 = (scales * scale_modifier) ** 2
    return sym33_from_rs(r, s2)


def covariance_strip(cov_packed: jnp.ndarray) -> jnp.ndarray:
    """Identity (covariances already travel packed, 3DGS PLY layout)."""
    return cov_packed


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
    max_radius: float | None = MAX_SPLAT_RADIUS,
) -> ProjectedGaussians:
    """Project 3D Gaussians into screen space (EWA).

    Args:
        means3d: [N, 3] world positions.
        cov3d: [N, 6] packed world-space covariance.
        colors: [N, 3] RGB colors (post-SH).
        opacities: [N] activated opacity.
        world_view: [4, 4] row-vector W2C (camera.world_view).
        full_proj: [4, 4] row-vector W2C @ P (camera.full_proj).
        width, height: image size (static).
        tanfovx, tanfovy: half-FoV tangents.
        alive: optional [N] bool mask for capacity-padded fields.
    """
    # Camera space (row-vector convention).
    t_cam = affine4_shared(means3d, world_view)          # [N, 4]
    tz = t_cam[:, 2]

    # Clip space -> NDC -> pixels.
    p_hom = affine4_shared(means3d, full_proj)           # [N, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    px = (p_hom[:, 0] * p_w + 1.0) * width * 0.5 - 0.5
    py = (p_hom[:, 1] * p_w + 1.0) * height * 0.5 - 0.5
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
    # A = J @ W, expanded: J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]],
    # W = view rotation (column-vector form) = world_view[:3, :3]^T.
    w00, w01, w02 = world_view[0, 0], world_view[0, 1], world_view[0, 2]
    w10, w11, w12 = world_view[1, 0], world_view[1, 1], world_view[1, 2]
    w20, w21, w22 = world_view[2, 0], world_view[2, 1], world_view[2, 2]
    # NOTE: row-vector storage means W_colvec[i, j] = world_view[j, i];
    # A_ik = sum_j J_ij * W_colvec[j, k] = J_i0*wv[k,0]... expanded per k:
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    a0 = (j00 * w00 + j02 * w02, j00 * w10 + j02 * w12, j00 * w20 + j02 * w22)
    a1 = (j11 * w01 + j12 * w02, j11 * w11 + j12 * w12, j11 * w21 + j12 * w22)
    c00, c01, c11 = sym33_quadform2((a0, a1), cov3d)

    # Low-pass: splat at least ~1 px (the rasterizer's +0.3 on the diagonal).
    c00 = c00 + 0.3
    c11 = c11 + 0.3

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
    if max_radius is None:
        # uncapped exact path: support bounded only by the screen diagonal
        # (the CUDA reference renders arbitrarily large splats; callers must
        # pass a matching rasterizer window)
        max_radius = float(np.hypot(width, height))
    radius = jnp.minimum(radius_raw, max_radius)
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
