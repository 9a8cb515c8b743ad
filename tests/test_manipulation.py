"""Closed-loop manipulation tests: env, MPC, goal fold, planning modalities."""

import numpy as np
import pytest

from cloth_splatting_tpu.manipulation.env import ClothEnv, goal_fold
from cloth_splatting_tpu.manipulation.mpc import MPC
from cloth_splatting_tpu.manipulation.planning import PlanningConfig, closed_loop_planning
from cloth_splatting_tpu.models.cloth_simulator import init_cloth_simulator


class TestEnv:
    def test_reset_and_step(self):
        env = ClothEnv(nx=8, ny=8, seed=0)
        env.reset()
        pick_idx, pick, place = env.sample_pick_place()
        env.grasp_particle(pick_idx)
        p0 = env.positions.copy()
        env.step(np.asarray([0.02, 0.01, 0.0]))
        assert np.linalg.norm(env.positions[pick_idx] - p0[pick_idx]) > 0.005
        d = env.trajectory_dict()
        assert d["pos"].shape[0] == 2
        assert d["actions"].shape == (1, 3)

    def test_goal_fold_reflects_half(self):
        pts = np.stack([np.linspace(-1, 1, 11), np.zeros(11), np.zeros(11)], 1)
        pick = np.asarray([-1.0, 0, 0])
        place = np.asarray([1.0, 0, 0])
        goal = goal_fold(pts, pick, place)
        # points left of the midpoint fold onto the right half
        assert (goal[:, 0] >= -1e-6).all()
        np.testing.assert_allclose(goal[-1], pts[-1])  # right side unchanged

    def test_keypoints(self):
        env = ClothEnv(nx=8, ny=8)
        env.reset()
        kp = env.keypoint_ids()
        assert len(kp) == 9 and len(set(kp)) == 9


class TestMPC:
    def test_candidates_and_rollout(self):
        rng = np.random.default_rng(0)
        sim_state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        mpc = MPC(sim_state, n_candidates=4, horizon=3, seed=0)
        mpc.init_sampler(1.0, 1, np.zeros(3), np.asarray([0.2, 0.2, 0.0]), 6)
        assert mpc.candidates.shape == (4, 6, 3)

        v = 20
        feats = {
            "pos0": rng.random((v, 3)).astype(np.float32),
            "velocity_history": np.zeros((2, v, 3), np.float32),
            "node_type": np.zeros(v, np.int32),
            "edge_index": np.asarray([[i, (i + 1) % v] for i in range(v)]).T,
            "grasped": 0,
        }
        rollouts = mpc.model_rollout(feats)
        assert rollouts.shape == (4, 4, v, 3)
        costs = mpc.compute_cost(rollouts, feats["pos0"])
        assert costs.shape == (4,)
        best, action = mpc.best_action(rollouts, feats["pos0"])
        assert 0 <= best < 4 and action.shape == (3,)

    def test_grasped_follows_candidate(self):
        rng = np.random.default_rng(1)
        sim_state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        mpc = MPC(sim_state, n_candidates=2, horizon=2, seed=1)
        mpc.init_sampler(1.0, 1, np.zeros(3), np.asarray([0.1, 0.0, 0.1]), 4)
        v = 10
        feats = {
            "pos0": np.zeros((v, 3), np.float32),
            "velocity_history": np.zeros((2, v, 3), np.float32),
            "node_type": np.eye(1, v, 3).ravel().astype(np.int32),
            "edge_index": np.asarray([[i, (i + 1) % v] for i in range(v)]).T,
            "grasped": 3,
        }
        rollouts = mpc.model_rollout(feats)
        expected = np.cumsum(mpc.candidates[:, :2], axis=1)
        np.testing.assert_allclose(rollouts[:, 1:, 3], expected, atol=1e-5)


class TestClosedLoop:
    @pytest.mark.parametrize("modality", ["fixed", "random"])
    def test_modelfree_modalities(self, modality, tmp_path):
        cfg = PlanningConfig(modality=modality, max_steps=6, traj_len=6,
                             num_samples=36, seed=0)
        res = closed_loop_planning(None, cfg, str(tmp_path))
        assert np.isfinite(res["final_cost"])
        if modality == "fixed":
            # the scripted fold must make real progress toward the goal
            assert res["final_cost"] < res["initial_cost"] * 0.8

    def test_mpc_oracle_runs(self, tmp_path):
        rng = np.random.default_rng(2)
        sim_state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        cfg = PlanningConfig(modality="mpc-oracle", max_steps=3, traj_len=5,
                             n_candidates=3, horizon=2, num_samples=36, seed=0)
        res = closed_loop_planning(sim_state, cfg, str(tmp_path))
        assert np.isfinite(res["final_cost"])
        assert len(res["costs"]) == 3

    @pytest.mark.slow
    def test_mpc_cs_full_loop(self, tmp_path):
        """The complete predict-update loop: render -> refine -> feed back."""
        rng = np.random.default_rng(3)
        sim_state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        cfg = PlanningConfig(modality="mpc-cs", max_steps=2, traj_len=4,
                             n_candidates=2, horizon=2, num_samples=36,
                             refine_steps=15, static_steps=25, n_views=3,
                             image_size=48, seed=0)
        res = closed_loop_planning(sim_state, cfg, str(tmp_path))
        assert np.isfinite(res["final_cost"])
        # the cs scene directory must be a valid train.py-style scene
        scene = str(tmp_path / "cs_scene")
        import os
        assert os.path.exists(os.path.join(scene, "transforms_train.json"))
        assert os.path.exists(os.path.join(scene, "init_mesh.hdf5"))
        assert os.path.isdir(os.path.join(scene, "mesh_predictions"))
