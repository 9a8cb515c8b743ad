"""Training losses: photometric + mesh regularizers.

Parity with reference scene_reconstruction/train_utils.py:50-102:
  * image loss = L1 + lambda_dssim * (1 - SSIM), mask-aware (mask applied
    multiplicatively to L1, and to the (1 - SSIM) map when present).
  * regularizers over the per-camera deformed vertices [B, V, 3]:
    deformation magnitude (mean L2 of consecutive deltas), rigid edge-length
    L1 vs rest-state lengths, momentum (second difference, per-vertex L1 norm).
"""

from __future__ import annotations

import jax.numpy as jnp

from cloth_splatting_tpu.models.gaussians import Mesh
from cloth_splatting_tpu.ops.image import l1_loss
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
                   lambda_momentum: float, static: bool = False) -> jnp.ndarray:
    """Mesh-deformation regularizers over consecutive-time vertex batches.

    Args:
        all_vertices: [B, V, 3] deformed vertices of the B cameras (which are
            consecutive timesteps in the 3-step batch regime).
    """
    if static:
        return jnp.zeros(())
    n_cams = all_vertices.shape[0]
    loss = jnp.zeros(())

    def safe_norm(x):
        # sqrt(ss + eps): finite gradient at exactly-zero displacements
        return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)

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
