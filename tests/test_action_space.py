"""Picker action-tool tests (reference manipulation/action_space/action_space.py)."""

import numpy as np
import pytest

from cloth_splatting_tpu.manipulation.action_space import (
    Box,
    PBDScene,
    Picker,
    PickerPickPlace,
    PickerQPG,
)


@pytest.fixture(scope="module")
def scene():
    return PBDScene(nx=8, ny=8, size=0.3, height=0.0, settle_steps=5)


def fresh_scene():
    return PBDScene(nx=8, ny=8, size=0.3, height=0.0, settle_steps=5)


class TestPicker:
    def test_reset_centers_ring(self):
        sc = fresh_scene()
        p = Picker(sc, num_picker=2)
        p.reset(np.array([0.1, 0.05, -0.1]))
        pos = p.get_picker_pos()
        assert pos.shape == (2, 3)
        # ring is centered on the reset center
        assert np.allclose(pos.mean(axis=0)[[0, 2]], [0.1, -0.1], atol=1e-6)
        assert np.allclose(pos[:, 1], 0.05)

    def test_pick_translates_particle(self):
        sc = fresh_scene()
        p = Picker(sc, num_picker=1, picker_threshold=0.05,
                   picker_low=(-1, 0, -1), picker_high=(1, 1, 1))
        # place the picker on top of particle 0 and pick
        target = sc.positions[0]
        p.picker_pos = target[None].astype(np.float64).copy()
        before = sc.positions[0].copy()
        p.step(np.array([0.0, 0.05, 0.0, 1.0]))
        assert p.picked_particles[0] == 0
        after = sc.positions[0]
        assert after[1] - before[1] == pytest.approx(0.05, abs=1e-6)
        # unpick releases
        p.step(np.array([0.0, 0.0, 0.0, 0.0]))
        assert p.picked_particles[0] is None

    def test_boundary_clamps_picker(self):
        sc = fresh_scene()
        p = Picker(sc, num_picker=1, picker_radius=0.05,
                   picker_low=(-0.1, 0.0, -0.1), picker_high=(0.1, 0.2, 0.1))
        p.picker_pos = np.zeros((1, 3))
        p.step(np.array([10.0, 10.0, 10.0, 0.0]))
        assert np.all(p.picker_pos <= p.picker_high - p.picker_radius + 1e-9)

    def test_spring_guard_reverts_overstretch(self):
        sc = fresh_scene()
        init = sc.positions.astype(np.float64)
        p = Picker(sc, num_picker=2, picker_threshold=0.05,
                   picker_low=(-1, 0, -1), picker_high=(1, 1, 1),
                   init_particle_pos=init, spring_coef=1.2)
        # pick two adjacent particles
        p.picker_pos = init[[0, 1]].copy()
        p.step(np.array([[0, 0.01, 0, 1.0], [0, 0.01, 0, 1.0]]).ravel())
        assert p.picked_particles[0] is not None
        assert p.picked_particles[1] is not None
        pa, pb = p.picked_particles
        before = sc.positions[[pa, pb]].copy()
        # drag them apart far beyond spring_coef * initial distance: reverted
        p.step(np.array([[-0.5, 0, 0, 1.0], [0.5, 0, 0, 1.0]]).ravel())
        after = sc.positions[[pa, pb]]
        assert np.allclose(after, before, atol=1e-6)


class TestPickerPickPlace:
    def test_moves_to_target_in_increments(self):
        sc = fresh_scene()
        p = PickerPickPlace(sc, num_picker=1, delta_move=0.02,
                            picker_low=(-1, 0, -1), picker_high=(1, 1, 1))
        p.picker_pos = sc.positions[0][None].astype(np.float64).copy()
        start = p.picker_pos[0].copy()
        target = start + np.array([0.1, 0.1, 0.0])
        n = p.step(np.array([*target, 1.0]))
        assert n > 1
        assert np.linalg.norm(p.picker_pos[0] - target) < 0.05
        # the picked particle followed and the cloth deformed
        assert p.picked_particles[0] is not None
        assert sc.positions[p.picked_particles[0]][1] > 0.02

    def test_get_model_action_is_pure(self):
        sc = fresh_scene()
        p = PickerPickPlace(sc, num_picker=1, delta_move=0.02,
                            picker_low=(-1, 0, -1), picker_high=(1, 1, 1))
        pos_before = sc.positions.copy()
        acts, end = p.get_model_action(np.array([0.1, 0.1, 0.0, 1.0]),
                                       np.zeros((1, 3)))
        assert len(acts) > 1
        np.testing.assert_allclose(sc.positions, pos_before)
        # integrated deltas reach the end position
        total = np.sum([a[:, :3] for a in acts], axis=0)
        np.testing.assert_allclose(np.zeros((1, 3)) + total, end, atol=1e-9)


class TestPickerQPG:
    def test_backprojection_hits_fixed_height(self):
        sc = fresh_scene()
        q = PickerQPG(sc, image_size=(64, 64), cam_pos=[0.0, 0.6, 0.4],
                      cam_angle=[0.0, -np.pi / 4, 0.0],
                      picker_low=(-1, 0, -1), picker_high=(1, 1, 1))
        w = q._get_world_coor_from_image(32.0, 32.0)
        assert w[1] == pytest.approx(q.particle_radius, abs=1e-6)

    def test_full_step_executes_and_settles(self):
        sc = fresh_scene()
        q = PickerQPG(sc, image_size=(64, 64), cam_pos=[0.0, 0.6, 0.4],
                      cam_angle=[0.0, -np.pi / 4, 0.0], delta_move=0.05,
                      picker_low=(-1, 0, -1), picker_high=(1, 1, 1))
        q.reset(np.zeros(3))
        n = q.step(np.array([0.0, 0.0, 0.1, 0.05, 0.0]))
        assert n >= 20  # at least the settle steps ran
        assert all(p is None for p in q.picked_particles)
        assert np.all(np.isfinite(sc.positions))


def test_box_space():
    b = Box(np.array([-1.0, 0.0]), np.array([1.0, 2.0]))
    s = b.sample(np.random.default_rng(0))
    assert b.contains(s)
    assert not b.contains(np.array([5.0, 0.0]))


def test_idle_picker_does_not_clobber_grasp_of_particle_zero():
    """Regression: an inactive picker's placeholder index 0 must not beat an
    active grasp of particle 0 in the duplicate-index scatter."""
    import jax.numpy as jnp
    from cloth_splatting_tpu.manipulation.sim import cloth_step_multi

    sc = fresh_scene()
    target = np.asarray(sc.state.pos)[0] + np.array([0.0, 0.12, 0.0])
    new = cloth_step_multi(
        sc.state, sc.cons,
        jnp.asarray([0, 0], jnp.int32),                  # idle picker also "0"
        jnp.stack([jnp.asarray(target, jnp.float32),
                   jnp.asarray(sc.state.pos)[0]]),
        jnp.asarray([True, False]),
        sc.params)
    np.testing.assert_allclose(np.asarray(new.pos)[0], target, atol=1e-5)
