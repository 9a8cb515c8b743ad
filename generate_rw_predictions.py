#!/usr/bin/env python
"""Real-world GNN mesh-prediction generator (reference
meshnet/generate_rw_predictions.py:1-328): load a real-world capture
(tracked cloth points + gripper track), run the real-world preprocessing
(gripper merge, Gaussian smoothing, z-flatten — data/realworld.py), roll the
trained ClothMeshSimulator forward WITH the edge-length-preserving inner
optimization, and save ``init_mesh.hdf5`` + ``mesh_predictions/mesh_%03d.hdf5``
into the scene directory — the input contract of train.py
(scene_reconstruction/scene.py:71-75).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))


def load_rw_capture(path: str) -> dict:
    """Load a raw real-world capture from .npz or .h5 (keys: pos [T,V,3],
    gripper_pos [T,3], pick [3], place [3])."""
    import h5py
    import numpy as np

    if os.path.isdir(path):
        files = (glob.glob(os.path.join(path, "*.h5"))
                 + glob.glob(os.path.join(path, "*.hdf5"))
                 + glob.glob(os.path.join(path, "*.npz")))
        if not files:
            raise FileNotFoundError(f"no capture files in {path}")
        path = files[0]
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    with h5py.File(path, "r") as f:
        return {k: f[k][()] for k in f.keys()}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Real-world GNN rollout -> scene meshes")
    p.add_argument("--data_path", type=str, required=True,
                   help="raw capture (.npz/.h5 or a directory holding one)")
    p.add_argument("--model_file", type=str, required=True,
                   help="trained ClothMeshSimulator checkpoint (.npz)")
    p.add_argument("--output_path", type=str, required=True,
                   help="scene directory to write init_mesh.hdf5 + mesh_predictions/")
    p.add_argument("--num_samples", type=int, default=200)
    p.add_argument("--input_sequence_length", type=int, default=2)
    p.add_argument("--refine_steps", type=int, default=10)
    p.add_argument("--refine_lr", type=float, default=1e-3)
    p.add_argument("--no_refine", action="store_true",
                   help="skip the edge-length-preserving inner optimization")
    p.add_argument("--latent", type=int, default=128)
    p.add_argument("--message_passing", type=int, default=15)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from cloth_splatting_tpu.data.predictions import save_mesh_predictions
    from cloth_splatting_tpu.data.realworld import preprocess_rw_trajectory
    from cloth_splatting_tpu.models.cloth_simulator import (
        init_cloth_simulator,
        rollout,
    )
    from cloth_splatting_tpu.utils.checkpoints import load_flat, restore_like

    raw = load_rw_capture(args.data_path)
    traj = preprocess_rw_trajectory(raw, num_samples=args.num_samples)
    print(f"preprocessed: {traj['pos'].shape[0]} steps, "
          f"{traj['pos'].shape[1]} particles, "
          f"{traj['edge_index'].shape[1]} edges, grasped={traj['grasped']}")

    template = init_cloth_simulator(
        np.random.default_rng(0),
        input_sequence_length=args.input_sequence_length,
        n_message_passing=args.message_passing, latent=args.latent)
    state = restore_like(template, load_flat(args.model_file))

    hist = args.input_sequence_length
    init_vel = np.zeros((hist, traj["pos"].shape[1], 3), np.float32)
    actions = traj["actions"][1:]            # a_t advances state t -> t+1
    n = actions.shape[0]
    pred, _ = rollout(
        state,
        jnp.asarray(traj["pos"][0]),
        jnp.asarray(init_vel),
        jnp.asarray(traj["node_type"]),
        jnp.asarray(traj["edge_index"]),
        jnp.asarray(actions),
        jnp.asarray(traj["grasped"]),
        n_steps=n,
        real_world=not args.no_refine,
        refine_steps=args.refine_steps,
        refine_lr=args.refine_lr,
    )
    positions = np.asarray(pred)
    os.makedirs(args.output_path, exist_ok=True)
    save_mesh_predictions(args.output_path, traj["faces"], positions)
    err = np.linalg.norm(positions[: traj["pos"].shape[0]] - traj["pos"],
                         axis=-1).mean()
    print(f"rollout: {positions.shape[0]} meshes -> {args.output_path} "
          f"(mean L2 vs capture {err:.4f})")


if __name__ == "__main__":
    main()
