"""Training losses: photometric + mesh regularizers.

Parity with reference scene_reconstruction/train_utils.py:50-102:
  * image loss = L1 + lambda_dssim * (1 - SSIM), mask-aware (mask applied
    multiplicatively to L1, and to the (1 - SSIM) map when present).
  * regularizers over the per-camera deformed vertices [B, V, 3]:
    deformation magnitude (mean L2 of consecutive deltas), rigid edge-length
    L1 vs rest-state lengths, momentum (second difference, per-vertex L1 norm).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cloth_splatting_tpu.models.gaussians import Mesh
from cloth_splatting_tpu.ops.image import l1_loss
from cloth_splatting_tpu.ops.smallmat import bmv3
from cloth_splatting_tpu.ops.ssim import ssim


def image_losses(images: jnp.ndarray, gt_images: jnp.ndarray, lambda_dssim: float,
                 masks: jnp.ndarray | None = None):
    """Photometric loss over a camera batch [B, 3, H, W]. Returns (loss, dict)."""
    l1 = l1_loss(images, gt_images, masks)
    loss = l1
    loss_dict = {"l1": l1}
    if lambda_dssim != 0.0:
        if masks is None:
            ssim_loss = 1.0 - ssim(images, gt_images)
        else:
            ssim_map = ssim(images, gt_images, return_map=True)
            ssim_loss = jnp.mean((1.0 - ssim_map) * masks)
        loss_dict["ssim_loss"] = ssim_loss
        loss = loss + lambda_dssim * ssim_loss
    return loss, loss_dict


def regularization(all_vertices: jnp.ndarray, mesh: Mesh,
                   lambda_deform_mag: float, lambda_rigid: float,
                   lambda_momentum: float, static: bool = False,
                   lambda_anchor: float = 0.0,
                   anchor_base: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mesh-deformation regularizers over consecutive-time vertex batches.

    Args:
        all_vertices: [B, V, 3] deformed vertices of the B cameras (which are
            consecutive timesteps in the 3-step batch regime).
        anchor_base: [B, V, 3] GNN-predicted vertices at the same times, for
            the lambda_anchor residual-magnitude penalty (see
            train/config.py lambda_anchor for the measured rationale).
    """
    if static:
        return jnp.zeros(())
    n_cams = all_vertices.shape[0]
    loss = jnp.zeros(())

    def safe_norm(x):
        # sqrt(ss + eps): finite gradient at exactly-zero displacements
        return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)

    if lambda_anchor > 0.0 and anchor_base is not None:
        loss = loss + lambda_anchor * safe_norm(
            all_vertices - anchor_base).mean()

    if lambda_deform_mag > 0.0 and n_cams >= 3:
        d0 = safe_norm(all_vertices[1] - all_vertices[0]).mean()
        d1 = safe_norm(all_vertices[2] - all_vertices[1]).mean()
        loss = loss + lambda_deform_mag * 0.5 * (d0 + d1)

    if lambda_rigid > 0.0:
        disp = all_vertices[:, mesh.edge_index[1]] - all_vertices[:, mesh.edge_index[0]]
        deformed_norm = safe_norm(disp)[..., None]                      # [B, E, 1]
        static_norm = jnp.broadcast_to(mesh.edge_norm[None], deformed_norm.shape)
        loss = loss + lambda_rigid * jnp.mean(jnp.abs(static_norm - deformed_norm))

    if lambda_momentum > 0.0 and n_cams >= 3:
        second_diff = all_vertices[2] - 2.0 * all_vertices[1] + all_vertices[0]
        loss = loss + lambda_momentum * jnp.sum(jnp.abs(second_diff), axis=-1).mean()

    return loss


class KnnState(NamedTuple):
    """Neighborhoods at the t=0 deformed state, refreshed every
    knn_update_iter (reference train.py:397, train_utils.py:113-119)."""

    idx: jnp.ndarray    # [C, k] i32
    d0: jnp.ndarray     # [C, k] f32 rest distances
    w: jnp.ndarray      # [C, k] f32 exp(-lambda_w * d0^2)
    valid: jnp.ndarray  # [C, k] bool


def knn_regularization(means: jnp.ndarray, rotations: jnp.ndarray,
                       knn: "KnnState", lambda_isometric: float,
                       lambda_spring: float, lambda_rigidity: float):
    """MD-Splatting kNN losses over a consecutive-time camera batch.

    Parity with the reference's preserved implementation
    (train_utils.py:125-192, external.py:50-51):
      * iso    = mean over cams of mean(knn_dist - knn_dist_t0)  [SIGNED —
        reference quirk kept: shrinkage below the rest distance is rewarded]
      * spring = mean |knn_dist_i - knn_dist_{i-1}| between consecutive cams
      * rigidity = weighted_l2_loss_v2 of the current kNN offsets rotated
        into the previous frame's local coordinates (neighbor rotations:
        rel = q_prev * q_curr^-1) vs the previous offsets, weights
        exp(-lambda_w * d0^2)

    Args:
        means: [B, C, 3] deformed Gaussian centers per camera (B consecutive
            timesteps).
        rotations: [B, C, 4] per-Gaussian quaternions per camera.
    """
    import jax

    from cloth_splatting_tpu.ops.quaternion import (
        quat_inverse,
        quat_multiply,
        quat_to_rotmat,
    )

    b = means.shape[0]
    idx, d0, w, valid = knn.idx, knn.d0, knn.w, knn.valid
    vnum = jnp.maximum(jnp.sum(valid), 1.0)

    def offsets_dists(m):
        off = m[idx] - m[:, None, :]                  # [C, k, 3]
        d = jnp.sqrt(jnp.sum(off * off, axis=-1) + 1e-20)
        return off, d

    offs, dists = jax.vmap(offsets_dists)(means)      # [B,C,k,3], [B,C,k]

    loss = jnp.zeros(())
    if lambda_isometric > 0.0:
        l_iso = jnp.mean(jnp.sum(
            jnp.where(valid[None], dists - d0[None], 0.0), axis=(1, 2)) / vnum)
        loss = loss + lambda_isometric * l_iso

    if lambda_spring > 0.0 and b >= 2:
        diff = jnp.abs(dists[1:] - dists[:-1])
        l_spring = jnp.mean(jnp.sum(
            jnp.where(valid[None], diff, 0.0), axis=(1, 2)) / vnum)
        loss = loss + lambda_spring * l_spring

    if lambda_rigidity > 0.0 and b >= 2:
        def rigid_pair(q_prev, q_curr, off_prev, off_curr):
            # neighbor rotations, previous-relative (reference :167-173)
            kq_prev = q_prev[idx].reshape(-1, 4)
            kq_curr = q_curr[idx].reshape(-1, 4)
            rel = quat_multiply(kq_prev, quat_inverse(kq_curr))
            rot = quat_to_rotmat(rel)                              # [C*k,3,3]
            cur = bmv3(rot, off_curr.reshape(-1, 3))  # elementwise, f32 (no bf16 einsum)
            d2 = jnp.sum((cur - off_prev.reshape(-1, 3)) ** 2, axis=-1)
            val = jnp.sqrt(d2 * w.reshape(-1) + 1e-20)
            return jnp.sum(jnp.where(valid.reshape(-1), val, 0.0)) / vnum

        l_rigid = jnp.mean(jax.vmap(rigid_pair)(
            rotations[:-1], rotations[1:], offs[:-1], offs[1:]))
        loss = loss + lambda_rigidity * l_rigid

    return loss
