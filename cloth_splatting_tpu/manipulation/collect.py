"""Trajectory data collection: run the PBD cloth sim through pick-and-place
actions and write h5 trajectories in the reference's sim-dataset format
(contract: manipulation/utils/data_collection.py:18-49 +
meshnet/data_utils.py:28-52 load_sim_traj): per-trajectory directory with one
``.h5`` containing ``pos`` [T,N,3], ``vel`` [T,N,3], ``actions`` [T-1,3],
``gripper_pos`` [T,3], ``pick`` [3], ``place`` [3], ``trajectory_params``.
Coordinates are y-up (PyFleX convention) so the loader's axis flip applies
identically.
"""

from __future__ import annotations

import os

import h5py
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.manipulation.sim import (
    ClothParams,
    ClothState,
    cloth_step,
    make_cloth,
    settle,
)
from cloth_splatting_tpu.manipulation.trajectory_gen import bezier_actions


def run_pick_place(state, cons, grasp_idx: int, actions: np.ndarray,
                   params: ClothParams = ClothParams()):
    """Execute per-step gripper displacements; returns (pos [T,N,3],
    vel [T,N,3], gripper [T,3]) with T = len(actions) + 1."""
    poses = [np.asarray(state.pos)]
    vels = [np.asarray(state.vel)]
    gripper = [np.asarray(state.pos[grasp_idx])]
    gi = jnp.asarray(grasp_idx, jnp.int32)
    active = jnp.ones((), bool)
    for a in actions:
        target = state.pos[grasp_idx] + jnp.asarray(a, jnp.float32)
        state = cloth_step(state, cons, gi, target, active, params)
        poses.append(np.asarray(state.pos))
        vels.append(np.asarray(state.vel))
        gripper.append(np.asarray(state.pos[grasp_idx]))
    return np.stack(poses), np.stack(vels), np.stack(gripper), state


def write_trajectory_h5(out_dir: str, pos, vel, actions, gripper_pos, pick, place,
                        trajectory_params=None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "trajectory.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("pos", data=np.asarray(pos, np.float32))
        f.create_dataset("vel", data=np.asarray(vel, np.float32))
        f.create_dataset("actions", data=np.asarray(actions, np.float32))
        f.create_dataset("gripper_pos", data=np.asarray(gripper_pos, np.float32))
        f.create_dataset("pick", data=np.asarray(pick, np.float32))
        f.create_dataset("place", data=np.asarray(place, np.float32))
        f.create_dataset(
            "trajectory_params",
            data=np.asarray(trajectory_params if trajectory_params is not None else [0.0],
                            np.float32),
        )
    return path


def collect_dataset(out_root: str, n_trajectories: int = 4, nx: int = 12,
                    ny: int = 12, cloth_size: float = 0.3, n_steps: int = 20,
                    seed: int = 0, params: ClothParams = ClothParams()) -> str:
    """Generate a directory tree ``out_root/ENV/traj_<i>/trajectory.h5``
    (the layout get_env_trajs_path walks, data_utils.py:116-132)."""
    rng = np.random.default_rng(seed)
    env_dir = os.path.join(out_root, "TOWEL")
    for i in range(n_trajectories):
        state, cons, (gx, gy) = make_cloth(nx, ny, cloth_size, height=0.0, params=params)
        state = settle(state, cons, n_steps=10, params=params)

        # pick a corner-ish particle, place across the cloth (fold-like)
        corner_ids = [0, gy - 1, (gx - 1) * gy, gx * gy - 1]
        grasp_idx = int(rng.choice(corner_ids))
        pick = np.asarray(state.pos[grasp_idx])
        opposite = np.asarray(state.pos[corner_ids[3 - corner_ids.index(grasp_idx)]])
        place = pick + (opposite - pick) * rng.uniform(0.6, 1.0) \
            + rng.normal(0, 0.02, 3) * np.asarray([1.0, 0.0, 1.0])
        height = rng.uniform(0.08, 0.2) * np.linalg.norm(place - pick) / max(cloth_size, 1e-6)
        actions = bezier_actions(pick, place, height, n_steps)

        pos, vel, gripper, _ = run_pick_place(state, cons, grasp_idx, actions, params)
        write_trajectory_h5(os.path.join(env_dir, f"traj_{i:04d}"),
                            pos, vel, actions, gripper, pick, place)
    return out_root
