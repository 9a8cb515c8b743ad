"""GNN rollout -> scene-directory bridge.

Parity with the reference's meshnet/generate_mesh_predictions.py:35-119 and
scripts/meshnet_scripts/trajectory2meshes.py: runs the trained dynamics model
(or a noisy ground-truth ablation) over a trajectory and writes the artifacts
train.py consumes: ``init_mesh.hdf5`` + ``mesh_predictions/mesh_%03d.hdf5``.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.data.mesh_io import save_mesh_h5, save_positions_h5
from cloth_splatting_tpu.models.gaussians import Mesh, compute_vertex_normals


def mesh_from_positions(pos: np.ndarray, faces: np.ndarray) -> Mesh:
    from cloth_splatting_tpu.data.meshing import faces_to_edges

    edge_index = faces_to_edges(faces.astype(np.int32))
    disp = pos[edge_index[1]] - pos[edge_index[0]]
    edge_norm = np.linalg.norm(disp, axis=1, keepdims=True).astype(np.float32)
    mesh = Mesh(
        pos=jnp.asarray(pos, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
        edge_index=jnp.asarray(edge_index),
        edge_norm=jnp.asarray(edge_norm),
        normals=jnp.zeros((pos.shape[0], 3), jnp.float32),
    )
    return mesh._replace(normals=compute_vertex_normals(mesh.pos, mesh.faces))


def save_mesh_predictions(scene_dir: str, faces: np.ndarray,
                          positions_over_time: np.ndarray) -> None:
    """Write init_mesh.hdf5 (t=0) + mesh_predictions/mesh_%03d.hdf5."""
    mesh0 = mesh_from_positions(positions_over_time[0], faces)
    save_mesh_h5(os.path.join(scene_dir, "init_mesh.hdf5"), mesh0)
    for t in range(positions_over_time.shape[0]):
        save_positions_h5(
            os.path.join(scene_dir, "mesh_predictions", f"mesh_{t:03d}.hdf5"),
            mesh0, positions_over_time[t],
        )


def generate_gnn_predictions(scene_dir: str, sim_state: dict, ds,
                             traj_idx: int = 0, normalize: bool = True) -> np.ndarray:
    """Rollout the trained GNN over trajectory ``traj_idx`` of dataset ``ds``
    and persist the predictions into ``scene_dir``. Returns [T, V, 3]."""
    from cloth_splatting_tpu.models.cloth_simulator import rollout

    item = ds.rollout_item(traj_idx)
    n = item["actions"].shape[0]
    traj, _ = rollout(
        sim_state,
        jnp.asarray(item["pos"][0]),
        jnp.asarray(item["init_velocity"]),
        jnp.asarray(item["node_type"]),
        jnp.asarray(item["edge_index"]),
        jnp.asarray(item["actions"]),
        jnp.asarray(item["grasped"]),
        n_steps=n,
        normalize=normalize,
    )
    positions = np.asarray(traj)
    save_mesh_predictions(scene_dir, np.asarray(item["faces"]), positions)
    return positions


def generate_noisy_gt_predictions(scene_dir: str, faces: np.ndarray,
                                  gt_positions: np.ndarray, ema: float = 0.9,
                                  noise_std: float = 0.01, seed: int = 0
                                  ) -> np.ndarray:
    """Noisy ground-truth ablation (reference trajectory2meshes.py:36-44):
    EMA-smoothed GT + gaussian noise, standing in for GNN rollouts."""
    rng = np.random.default_rng(seed)
    out = np.empty_like(gt_positions)
    smoothed = gt_positions[0]
    for t in range(gt_positions.shape[0]):
        smoothed = ema * smoothed + (1 - ema) * gt_positions[t]
        out[t] = smoothed + rng.normal(0, noise_std, smoothed.shape)
    save_mesh_predictions(scene_dir, faces, out)
    return out
