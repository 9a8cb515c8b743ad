"""HDF5 mesh IO, byte-compatible with the reference's ``init_mesh.hdf5`` /
``mesh_predictions/mesh_*.hdf5`` contract (reference:
meshnet/data_utils.py:450-457 and gaussian_mesh.py:462-465): datasets
``pos`` [V,3], ``norm`` [V,3], ``face`` [3,F], ``edge_index`` [2,E]."""

from __future__ import annotations

import os

import h5py
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.models.gaussians import Mesh, compute_vertex_normals


def load_mesh_h5(path: str) -> Mesh:
    with h5py.File(path, "r") as f:
        pos = np.asarray(f["pos"][:], dtype=np.float32)
        faces = np.asarray(f["face"][:], dtype=np.int32).T        # [3,F] -> [F,3]
        edge_index = np.asarray(f["edge_index"][:], dtype=np.int32)
        norm = np.asarray(f["norm"][:], dtype=np.float32) if "norm" in f else None
    disp = pos[edge_index[1]] - pos[edge_index[0]]
    edge_norm = np.linalg.norm(disp, axis=1, keepdims=True).astype(np.float32)
    mesh = Mesh(
        pos=jnp.asarray(pos),
        faces=jnp.asarray(faces),
        edge_index=jnp.asarray(edge_index),
        edge_norm=jnp.asarray(edge_norm),
        normals=jnp.asarray(norm) if norm is not None else jnp.zeros_like(jnp.asarray(pos)),
    )
    if norm is None:
        mesh = mesh._replace(normals=compute_vertex_normals(mesh.pos, mesh.faces))
    return mesh


def save_mesh_h5(path: str, mesh: Mesh) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("pos", data=np.asarray(mesh.pos, dtype=np.float32))
        f.create_dataset("norm", data=np.asarray(mesh.normals, dtype=np.float32))
        f.create_dataset("face", data=np.asarray(mesh.faces, dtype=np.int64).T)
        f.create_dataset("edge_index", data=np.asarray(mesh.edge_index, dtype=np.int64))


def save_positions_h5(path: str, mesh: Mesh, positions: np.ndarray) -> None:
    """Save a mesh prediction: same topology, new vertex positions."""
    m = mesh._replace(
        pos=jnp.asarray(positions),
        normals=compute_vertex_normals(jnp.asarray(positions), mesh.faces),
    )
    save_mesh_h5(path, m)
