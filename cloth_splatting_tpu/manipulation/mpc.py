"""Sampling-based MPC over the GNN dynamics model.

Re-derived from the reference's missing ``manipulation.planner.mpc`` module
via its call-site contract (manipulation/planning.py:289-341, SURVEY.md
section 3.4): ``MPC(meshnet, A, H, input_sequence_length)``,
``init_sampler(velocity, action_repetition, pick, goal_place, traj_len,
invert_yz)``, ``sample_candidate_actions()``, ``model_rollout(...)``,
``compute_cost(rollouts, goal)``, ``update_candidates(gripper_pos,
action_repetition)``.

TPU-native: all A candidate rollouts run as ONE vmapped scan — the GNN
message passing batches over candidates on the MXU instead of looping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.manipulation.trajectory_gen import bezier_actions
from cloth_splatting_tpu.models.cloth_simulator import rollout


class MPC:
    def __init__(self, sim_state: dict, n_candidates: int = 16, horizon: int = 5,
                 input_sequence_length: int = 2, normalize: bool = True,
                 seed: int = 0):
        self.sim_state = sim_state
        self.A = n_candidates
        self.H = horizon
        self.hist = input_sequence_length
        self.normalize = normalize
        self.rng = np.random.default_rng(seed)
        self.candidates: np.ndarray | None = None   # [A, steps, 3]
        self.step_idx = 0

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def _batched_rollout(sim_state, pos0, init_vel, node_type, edge_index,
                             actions_batch, grasped, n_steps):
            def one(actions):
                traj, _ = rollout(sim_state, pos0, init_vel, node_type,
                                  edge_index, actions, grasped,
                                  n_steps=n_steps, normalize=self.normalize)
                return traj
            return jax.vmap(one)(actions_batch)

        self._batched_rollout = _batched_rollout

    # ------------------------------------------------------------- candidates

    def init_sampler(self, velocity: float, action_repetition: int,
                     pick: np.ndarray, goal_place: np.ndarray, traj_len: int,
                     invert_yz: bool = False) -> None:
        self.velocity = velocity
        self.action_repetition = action_repetition
        self.pick = np.asarray(pick, np.float32)
        self.goal_place = np.asarray(goal_place, np.float32)
        self.traj_len = traj_len
        self.step_idx = 0
        self.sample_candidate_actions()

    def sample_candidate_actions(self) -> np.ndarray:
        """Bezier arcs from the current pick to noisy placements around the
        goal (contract: trajectory_gen.py:149-199 bezier candidates)."""
        cands = []
        span = np.linalg.norm(self.goal_place - self.pick)
        for a in range(self.A):
            place = self.goal_place.copy()
            if a > 0:  # candidate 0 aims exactly at the goal
                place = place + self.rng.normal(0, 0.15 * span, 3) \
                    * np.asarray([1.0, 0.0, 1.0])
            height = self.rng.uniform(0.1, 0.5) * span
            cands.append(bezier_actions(self.pick, place, height, self.traj_len))
        self.candidates = np.stack(cands).astype(np.float32)
        return self.candidates

    def update_candidates(self, gripper_pos: np.ndarray,
                          action_repetition: int = 1) -> None:
        """Re-plan remaining actions from the executed gripper position."""
        self.pick = np.asarray(gripper_pos, np.float32)
        self.step_idx += 1
        remaining = max(self.traj_len - self.step_idx, 1)
        self.traj_len = remaining
        self.sample_candidate_actions()

    # ---------------------------------------------------------------- rollout

    def model_rollout(self, features: dict, horizon: int | None = None
                      ) -> np.ndarray:
        """GNN rollouts for every candidate from the dataset's current state.

        Args:
            features: dict with pos0 [V,3], velocity_history [hist,V,3],
                node_type [V], edge_index [2,E], grasped (int).
        Returns [A, h+1, V, 3] predicted positions.
        """
        h = min(horizon or self.H, self.candidates.shape[1])
        trajs = self._batched_rollout(
            self.sim_state,
            jnp.asarray(features["pos0"]),
            jnp.asarray(features["velocity_history"]),
            jnp.asarray(features["node_type"]),
            jnp.asarray(features["edge_index"]),
            jnp.asarray(self.candidates[:, :h]),
            jnp.asarray(features["grasped"]),
            n_steps=h,
        )
        return np.asarray(trajs)

    # ------------------------------------------------------------------- cost

    @staticmethod
    def compute_cost(rollouts: np.ndarray, goal_particles: np.ndarray
                     ) -> np.ndarray:
        """Mean squared distance of each rollout's FINAL state to the goal.
        Returns per-candidate costs [A]."""
        final = rollouts[:, -1]                       # [A, V, 3]
        return np.mean((final - goal_particles[None]) ** 2, axis=(1, 2))

    def best_action(self, rollouts: np.ndarray, goal_particles: np.ndarray
                    ) -> tuple[int, np.ndarray]:
        costs = self.compute_cost(rollouts, goal_particles)
        best = int(np.argmin(costs))
        return best, self.candidates[best, 0]
