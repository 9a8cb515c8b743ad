"""GNN dynamics tests: shapes, permutation equivariance, one-step overfit,
rollout, PBD sim, dataset plumbing (SURVEY.md section 4 layer 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.data.trajectories import ClothSampleDataset, process_trajectory
from cloth_splatting_tpu.manipulation.collect import collect_dataset, run_pick_place
from cloth_splatting_tpu.manipulation.sim import ClothParams, make_cloth, settle
from cloth_splatting_tpu.manipulation.trajectory_gen import (
    bezier_actions,
    bezier_path,
    sample_candidate_actions,
)
from cloth_splatting_tpu.models import meshnet as M
from cloth_splatting_tpu.models.cloth_simulator import (
    edge_features_from_positions,
    init_cloth_simulator,
    predict_acceleration,
    predict_velocity,
    rollout,
)
from cloth_splatting_tpu.train.meshnet_train import MeshnetTrainer, train_meshnet


def tiny_graph(v=12, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.random((v, 3)).astype(np.float32)
    # ring + random chords, bidirectional
    e = [(i, (i + 1) % v) for i in range(v)] + [(i, (i + 3) % v) for i in range(v)]
    e = np.asarray(e + [(b, a) for a, b in e], np.int32).T
    return jnp.asarray(pos), jnp.asarray(e)


class TestGNNCore:
    def test_mlp_layernorm(self):
        rng = np.random.default_rng(0)
        p = M.init_mlp(rng, [8, 16, 16], layer_norm=True)
        out = M.apply_mlp(p, jnp.ones((4, 8)))
        assert out.shape == (4, 16)
        np.testing.assert_allclose(np.asarray(out).mean(-1), 0.0, atol=1e-5)

    def test_epd_shapes(self):
        rng = np.random.default_rng(1)
        pos, e = tiny_graph()
        params = M.init_encode_process_decode(rng, nnode_in=8, nnode_out=3,
                                              nedge_in=4, n_message_passing=3)
        feats = jnp.asarray(np.random.default_rng(2).random((12, 8)), jnp.float32)
        ef = edge_features_from_positions(pos, e)
        out = M.apply_encode_process_decode(params, feats, e, ef)
        assert out.shape == (12, 3)

    def test_permutation_equivariance(self):
        """Relabeling nodes must permute outputs identically."""
        rng = np.random.default_rng(3)
        pos, e = tiny_graph()
        params = M.init_encode_process_decode(rng, 8, 3, 4, n_message_passing=3)
        feats = jnp.asarray(np.random.default_rng(4).random((12, 8)), jnp.float32)
        ef = edge_features_from_positions(pos, e)
        out = M.apply_encode_process_decode(params, feats, e, ef)

        perm = np.random.default_rng(5).permutation(12)
        inv = np.argsort(perm)
        e_p = jnp.asarray(inv)[e]
        out_p = M.apply_encode_process_decode(
            params, feats[perm], e_p, edge_features_from_positions(pos[perm], e_p))
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out)[perm], atol=2e-4)

    def test_edge_mask_equals_dropped_edges(self):
        rng = np.random.default_rng(6)
        pos, e = tiny_graph()
        params = M.init_encode_process_decode(rng, 8, 3, 4, n_message_passing=2)
        feats = jnp.asarray(np.random.default_rng(7).random((12, 8)), jnp.float32)
        keep = e[:, : e.shape[1] - 6]
        out_trunc = M.apply_encode_process_decode(
            params, feats, keep, edge_features_from_positions(pos, keep))
        mask = jnp.asarray([True] * (e.shape[1] - 6) + [False] * 6)
        out_masked = M.apply_encode_process_decode(
            params, feats, e, edge_features_from_positions(pos, e), edge_mask=mask)
        np.testing.assert_allclose(out_masked, out_trunc, atol=1e-5)

    def test_normalizer_statistics(self):
        state = M.init_normalizer(3)
        rng = np.random.default_rng(8)
        data = jnp.asarray(rng.normal(2.0, 3.0, (1000, 3)), jnp.float32)
        normed, state = M.normalizer_apply(state, data, accumulate=True)
        np.testing.assert_allclose(np.asarray(normed).mean(0), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(normed).std(0), 1.0, atol=1e-2)
        back = M.normalizer_inverse(state, normed)
        np.testing.assert_allclose(np.asarray(back), np.asarray(data), atol=1e-4)


class TestPBDSim:
    def test_cloth_falls_and_settles(self):
        state, cons, _ = make_cloth(8, 8, 0.3, height=0.3)
        state = settle(state, cons, n_steps=120)
        y = np.asarray(state.pos[:, 1])
        assert y.max() < 0.1  # fell to the ground
        assert y.min() >= -1e-4

    def test_edge_lengths_preserved(self):
        state, cons, _ = make_cloth(8, 8, 0.3, height=0.2)
        state = settle(state, cons, n_steps=80)
        d = np.asarray(state.pos)[np.asarray(cons.edges[:, 1])] - \
            np.asarray(state.pos)[np.asarray(cons.edges[:, 0])]
        lengths = np.linalg.norm(d, axis=1)
        rel = np.abs(lengths - np.asarray(cons.rest_len)) / np.asarray(cons.rest_len)
        structural = np.asarray(cons.stiff) == 1.0
        assert np.median(rel[structural]) < 0.12

    def test_grasp_moves_particle(self):
        state, cons, (gx, gy) = make_cloth(8, 8, 0.3, height=0.0)
        state = settle(state, cons, n_steps=10)
        pick = np.asarray(state.pos[0])
        place = pick + np.asarray([0.15, 0.0, 0.15])
        actions = bezier_actions(pick, place, 0.1, 12)
        pos, vel, gripper, _ = run_pick_place(state, cons, 0, actions)
        np.testing.assert_allclose(pos[-1, 0], place, atol=0.02)
        # the rest of the cloth followed (some particles moved)
        assert np.linalg.norm(pos[-1] - pos[0], axis=1).mean() > 0.01

    def test_bezier_path_endpoints(self):
        pick = np.zeros(3)
        place = np.asarray([1.0, 0.0, 0.0])
        path = bezier_path(pick, place, 0.3, 10)
        np.testing.assert_allclose(path[0], pick, atol=1e-9)
        np.testing.assert_allclose(path[-1], place, atol=1e-9)
        assert path[:, 1].max() > 0.1  # arcs upward

    def test_candidate_actions_shape(self):
        rng = np.random.default_rng(0)
        c = sample_candidate_actions(rng, np.zeros(3), np.ones(3), 5, 8)
        assert c.shape == (5, 8, 3)


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("simdata")
    return collect_dataset(str(root), n_trajectories=3, nx=8, ny=8,
                           n_steps=14, seed=0)


class TestTrajectoryDataset:
    def test_load_and_process(self, sim_dataset):
        ds = ClothSampleDataset(sim_dataset, input_seq_len=2, future_seq_len=1,
                                num_samples=64)
        assert len(ds.trajs) == 3
        assert len(ds) > 0
        s = ds.sample(0)
        v = ds.n_nodes
        assert s["velocity"].shape == (v, 6)
        assert s["target_vel"].shape == (v, 1, 3)
        assert s["edge_index"].shape == (2, ds.e_max)
        assert s["node_type"].sum() == 1  # exactly one grasped node

    def test_future_curriculum_changes_lengths(self, sim_dataset):
        ds = ClothSampleDataset(sim_dataset, future_seq_len=1, num_samples=64)
        l1 = len(ds)
        ds.set_future_seq_len(3)
        assert len(ds) == l1 - 2 * len(ds.trajs)

    def test_batch_shapes(self, sim_dataset):
        ds = ClothSampleDataset(sim_dataset, future_seq_len=2, num_samples=64)
        batch = ds.batch(np.random.default_rng(0), 4)
        assert batch["velocity"].shape[0] == 4
        assert batch["particle_actions"].shape == (4, ds.n_nodes, 2, 3)

    def test_grasped_velocity_matches_action(self, sim_dataset):
        """The grasped node's injected history slot must be the action-induced
        velocity (dt=1 => equal to the displacement)."""
        ds = ClothSampleDataset(sim_dataset, future_seq_len=1, num_samples=64)
        s = ds.sample(3)
        g = int(s["grasped"])
        np.testing.assert_allclose(s["velocity"][g, -3:], s["target_vel"][g, 0],
                                   atol=1e-6)


class TestTrainingAndRollout:
    def test_one_step_overfit(self, sim_dataset):
        """Tiny GNN must overfit a handful of samples."""
        ds = ClothSampleDataset(sim_dataset, future_seq_len=1, num_samples=48)
        rng = np.random.default_rng(0)
        state = init_cloth_simulator(rng, input_sequence_length=2,
                                     n_message_passing=3, latent=32)
        trainer = MeshnetTrainer(lr_init=1e-3, normalize=True)
        opt_state = trainer.init_opt(state)
        key = jax.random.PRNGKey(0)
        batch = ds.batch(np.random.default_rng(1), 4)
        losses = []
        for i in range(80):
            key, sub = jax.random.split(key)
            state, opt_state, loss = trainer.train_step(state, opt_state, batch,
                                                        sub, epoch=0, future=1)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.25, (losses[0], losses[-1])

    def test_multistep_unroll_trains(self, sim_dataset):
        ds = ClothSampleDataset(sim_dataset, future_seq_len=2, num_samples=48)
        rng = np.random.default_rng(2)
        state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        trainer = MeshnetTrainer(lr_init=1e-3, noise_std=1e-4)
        opt_state = trainer.init_opt(state)
        batch = ds.batch(np.random.default_rng(3), 3)
        key = jax.random.PRNGKey(1)
        l0 = None
        for i in range(15):
            key, sub = jax.random.split(key)
            state, opt_state, loss = trainer.train_step(state, opt_state, batch,
                                                        sub, epoch=0, future=2)
            l0 = l0 or float(loss)
        assert float(loss) < l0

    def test_rollout_shapes_and_grasp_override(self, sim_dataset):
        ds = ClothSampleDataset(sim_dataset, future_seq_len=1, num_samples=48)
        rng = np.random.default_rng(4)
        state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        item = ds.rollout_item(0)
        n = 5
        traj, vels = rollout(
            state, jnp.asarray(item["pos"][0]), jnp.asarray(item["init_velocity"]),
            jnp.asarray(item["node_type"]), jnp.asarray(item["edge_index"]),
            jnp.asarray(item["actions"]), jnp.asarray(item["grasped"]), n_steps=n)
        assert traj.shape == (n + 1, ds.n_nodes, 3)
        # grasped node exactly follows actions
        g = int(item["grasped"])
        expected = item["pos"][0][g] + np.cumsum(item["actions"][:n], axis=0)
        np.testing.assert_allclose(np.asarray(traj[1:, g]), expected, atol=1e-5)

    def test_train_meshnet_epoch_loop(self, sim_dataset, tmp_path):
        ds = ClothSampleDataset(sim_dataset, future_seq_len=1, num_samples=48)
        rng = np.random.default_rng(5)
        state = init_cloth_simulator(rng, 2, n_message_passing=2, latent=32)
        trainer = MeshnetTrainer(lr_init=1e-3)
        state, losses = train_meshnet(
            trainer, state, ds, val_ds=ds, n_epochs=2, batch_size=3,
            curriculum=False, model_dir=str(tmp_path / "ckpt"), save_every=1,
            steps_per_epoch=3)
        assert len(losses) == 2
        # reload
        restored = trainer.load(str(tmp_path / "ckpt"), state)
        np.testing.assert_allclose(
            np.asarray(restored["gnn"]["decoder"]["layers"][0]["w"]),
            np.asarray(state["gnn"]["decoder"]["layers"][0]["w"]))


class TestEmbeddingSimulator:
    """ResidualMeshSimulatorEmbedding parity (meshnet_network.py:382-411)."""

    def test_embedding_residual_added_at_time_id(self):
        import jax.numpy as jnp
        from cloth_splatting_tpu.models.deform import (
            init_embedding_simulator, simulate_embedding)

        rng = np.random.default_rng(0)
        T, V = 4, 7
        preds = jnp.asarray(rng.normal(size=(T, V, 3)), jnp.float32)
        params = init_embedding_simulator(rng, T, V)
        for tid in range(T):
            t = tid / (T - 1)
            out = simulate_embedding(params, preds, jnp.asarray(t))
            expected = preds[tid] + params.embedding[tid].reshape(V, 3)
            np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                       atol=1e-6)

    def test_single_time_dt_guard(self):
        import jax.numpy as jnp
        from cloth_splatting_tpu.models.deform import (
            init_embedding_simulator, simulate_embedding)

        rng = np.random.default_rng(1)
        preds = jnp.zeros((1, 5, 3), jnp.float32)
        params = init_embedding_simulator(rng, 1, 5)
        out = simulate_embedding(params, preds, jnp.asarray(0.0))
        assert out.shape == (5, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestMeshViz:
    """Mesh visualization assets (reference meshnet/viz.py parity)."""

    def test_rollout_frames_and_gif(self, tmp_path):
        from cloth_splatting_tpu.eval.mesh_viz import (
            create_gif,
            plot_mesh,
            plot_mesh_predictions,
            rollout_frames,
        )

        rng = np.random.default_rng(0)
        pts = rng.normal(0, 0.1, size=(16, 3)).astype(np.float32)
        edges = np.stack([np.arange(15), np.arange(1, 16)])
        img = plot_mesh(pts, edges)
        assert img.ndim == 3 and img.shape[2] == 3

        gt = np.stack([pts + 0.01 * t for t in range(3)])
        pred = gt + rng.normal(0, 0.005, gt.shape).astype(np.float32)
        img2 = plot_mesh_predictions(gt[0], pred[0], edges)
        assert img2.shape == img.shape

        paths = rollout_frames(gt, pred, edges, str(tmp_path / "frames"))
        assert len(paths) == 3
        gif = create_gif(paths, str(tmp_path / "rollout.gif"))
        import os as _os
        assert _os.path.getsize(gif) > 0


class TestGraphOptions:
    """--delaunay/--knn/--subsample plumbed through the dataset (reference
    compute_edges_index fallback, meshnet/data_utils.py:407-416)."""

    def test_knn_graph_fallback(self, tmp_path):
        from cloth_splatting_tpu.manipulation.collect import collect_dataset

        root = str(tmp_path / "ds")
        collect_dataset(root, n_trajectories=1, nx=8, ny=8, n_steps=6)
        d_del = ClothSampleDataset(root, 2, 1, 1.0, 40, use_delaunay=True)
        d_knn = ClothSampleDataset(root, 2, 1, 1.0, 40, use_delaunay=False,
                                   knn=4)
        e_del = d_del.trajs[0]["edge_index"]
        e_knn = d_knn.trajs[0]["edge_index"]
        assert e_del.shape[0] == 2 and e_knn.shape[0] == 2
        assert e_knn.shape[1] != e_del.shape[1]   # genuinely different graphs
        # bidirectional
        s_knn = {(int(a), int(b)) for a, b in e_knn.T}
        assert all((b, a) in s_knn for a, b in s_knn)

    def test_no_subsample_keeps_all_nodes(self, tmp_path):
        from cloth_splatting_tpu.manipulation.collect import collect_dataset

        root = str(tmp_path / "ds")
        collect_dataset(root, n_trajectories=1, nx=8, ny=8, n_steps=6)
        d = ClothSampleDataset(root, 2, 1, 1.0, 40, subsample=False)
        assert d.trajs[0]["pos"].shape[1] == 64   # all 8x8 particles
