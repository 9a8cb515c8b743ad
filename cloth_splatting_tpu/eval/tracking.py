"""3D tracking evaluation: trajectory alignment + Mean Trajectory Error.

Parity with the reference's scripts/align_eval_trajs.py:30-98 +
extract_aligned_trajs.py: for every ground-truth point at t=0, find the
nearest inferred trajectory, rigidly transport it through time using the
per-Gaussian rotations, and report MTE = mean L2 error over time (in the
dataset's length units; the paper tables use mm).
"""

from __future__ import annotations

import numpy as np

from cloth_splatting_tpu.ops.quaternion import quat_to_rotmat

import jax.numpy as jnp


def align_trajectories(pred_traj: np.ndarray, pred_rot: np.ndarray | None,
                       gt_traj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Match each GT point to its nearest predicted trajectory at t=0 and
    rigidly align the offset over time.

    Args:
        pred_traj: [T, N, 3] inferred point trajectories.
        pred_rot: [T, N, 4] WXYZ rotations per point per time (or None for
            translation-only transport).
        gt_traj: [T, M, 3] ground-truth trajectories.

    Returns:
        (aligned [T, M, 3] predicted positions for each GT point, mte [M]).
    """
    t_steps, m = gt_traj.shape[0], gt_traj.shape[1]

    # nearest predicted point at t=0
    d0 = np.linalg.norm(gt_traj[0][:, None, :] - pred_traj[0][None, :, :], axis=-1)
    nearest = np.argmin(d0, axis=1)                      # [M]
    offset0 = gt_traj[0] - pred_traj[0][nearest]         # [M, 3]

    aligned = np.zeros_like(gt_traj)
    if pred_rot is not None:
        rot0 = np.asarray(quat_to_rotmat(jnp.asarray(pred_rot[0][nearest])))
        for t in range(t_steps):
            rt = np.asarray(quat_to_rotmat(jnp.asarray(pred_rot[t][nearest])))
            # transport the t0 offset by the relative rotation R_t R_0^T
            rel = np.einsum("mij,mkj->mik", rt, rot0)
            off_t = np.einsum("mij,mj->mi", rel, offset0)
            aligned[t] = pred_traj[t][nearest] + off_t
    else:
        for t in range(t_steps):
            aligned[t] = pred_traj[t][nearest] + offset0

    err = np.linalg.norm(aligned - gt_traj, axis=-1)     # [T, M]
    mte = err.mean(axis=0)                               # [M]
    return aligned, mte


def evaluate_tracking(all_trajs_path: str, gt_path: str,
                      save_aligned: str | None = None) -> dict:
    """File-level entry: all_trajs.npz (from render.py --log_deform) vs the
    dataset's gt.npz {'traj': [T, M, 3]}."""
    data = np.load(all_trajs_path)
    pred = data["traj"]
    rot = data["rotations"] if "rotations" in data.files else None
    gt = np.load(gt_path, allow_pickle=True)["traj"]
    t = min(pred.shape[0], gt.shape[0])
    aligned, mte = align_trajectories(pred[:t], rot[:t] if rot is not None else None,
                                      gt[:t])
    if save_aligned:
        np.savez(save_aligned, aligned=aligned, mte=mte)
    return {"mte_mean": float(mte.mean()), "mte_median": float(np.median(mte)),
            "n_points": int(mte.shape[0]), "n_times": int(t)}
