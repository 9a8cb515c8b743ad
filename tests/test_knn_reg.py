"""MD-Splatting kNN regularizers (reference train_utils.py:104-235,
external.py:5-57): isometric / spring / rigidity semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.train.losses import KnnState, knn_regularization


def make_knn_state(pts, k=3, lambda_w=2000.0):
    from cloth_splatting_tpu.ops.knn import knn

    d2, idx = knn(jnp.asarray(pts), k=k)
    valid = jnp.isfinite(d2)
    d2 = jnp.where(valid, d2, 0.0)
    return KnnState(idx=idx.astype(jnp.int32), d0=jnp.sqrt(d2),
                    w=jnp.where(valid, jnp.exp(-lambda_w * d2), 0.0),
                    valid=valid)


def grid_points(n=5, spacing=0.1):
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    return np.stack([xs.ravel() * spacing, ys.ravel() * spacing,
                     np.zeros(n * n)], 1).astype(np.float32)


IDQ = np.asarray([1.0, 0.0, 0.0, 0.0], np.float32)


class TestKnnRegularization:
    def test_rigid_translation_is_free(self):
        """Pure translation between frames: all three losses vanish."""
        pts = grid_points()
        knn_state = make_knn_state(pts)
        m0 = jnp.asarray(pts)
        m1 = m0 + jnp.asarray([0.3, -0.1, 0.2])
        means = jnp.stack([m0, m1])
        rots = jnp.broadcast_to(jnp.asarray(IDQ), (2, pts.shape[0], 4))
        loss = knn_regularization(means, rots, knn_state, 1.0, 1.0, 1.0)
        assert abs(float(loss)) < 1e-5, float(loss)

    def test_stretch_penalized_by_iso_and_spring(self):
        pts = grid_points()
        knn_state = make_knn_state(pts)
        m0 = jnp.asarray(pts)
        m1 = m0 * 1.5                       # uniform stretch
        means = jnp.stack([m0, m1])
        rots = jnp.broadcast_to(jnp.asarray(IDQ), (2, pts.shape[0], 4))
        l_iso = knn_regularization(means, rots, knn_state, 1.0, 0.0, 0.0)
        l_spring = knn_regularization(means, rots, knn_state, 0.0, 1.0, 0.0)
        assert float(l_iso) > 1e-3          # distances grew vs rest
        assert float(l_spring) > 1e-3       # and changed between frames

    def test_iso_is_signed_reference_quirk(self):
        """Compression REDUCES the (signed) isometric loss — the reference
        takes mean(d - d0), not mean(|d - d0|) (train_utils.py:155)."""
        pts = grid_points()
        knn_state = make_knn_state(pts)
        m0 = jnp.asarray(pts)
        means = jnp.stack([m0, m0 * 0.5])
        rots = jnp.broadcast_to(jnp.asarray(IDQ), (2, pts.shape[0], 4))
        l_iso = knn_regularization(means, rots, knn_state, 1.0, 0.0, 0.0)
        assert float(l_iso) < 0.0

    def test_rotation_with_matching_quats_is_rigid_free(self):
        """Rotating the cloud AND its per-gaussian quaternions by the same
        rotation keeps the rigidity loss at zero (offsets transported into
        the previous local frame match)."""
        from cloth_splatting_tpu.ops.quaternion import quat_to_rotmat

        # cm-scale spacing: lambda_w=2000 means exp(-2000 d^2) weights are
        # only non-vanishing for d ~ 1e-2 (the reference's metric scale)
        pts = grid_points(spacing=0.01)
        knn_state = make_knn_state(pts)
        ang = 0.4
        q1 = jnp.asarray([np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)],
                         jnp.float32)
        r1 = quat_to_rotmat(q1[None])[0]
        m0 = jnp.asarray(pts)
        m1 = m0 @ r1.T
        means = jnp.stack([m0, m1])
        n = pts.shape[0]
        rots = jnp.stack([
            jnp.broadcast_to(jnp.asarray(IDQ), (n, 4)),
            jnp.broadcast_to(q1, (n, 4)),
        ])
        l_rigid = knn_regularization(means, rots, knn_state, 0.0, 0.0, 1.0)
        # sqrt(eps) floor from weighted_l2_loss_v2's 1e-20 stabilizer
        assert float(l_rigid) < 1e-4, float(l_rigid)

        # mismatched quats (cloud rotates, quats don't) -> penalized
        rots_bad = jnp.broadcast_to(jnp.asarray(IDQ), (2, n, 4))
        l_bad = knn_regularization(means, rots_bad, knn_state, 0.0, 0.0, 1.0)
        assert float(l_bad) > 100 * max(float(l_rigid), 1e-10)

    @pytest.mark.slow
    def test_trainer_step_with_knn_state(self):
        """A dynamic train step with lambda_iso > 0 consumes the kNN state
        and still produces a finite loss (end-to-end smoke)."""
        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        from cloth_splatting_tpu.models import gaussians as G
        from cloth_splatting_tpu.ops.camera import Camera
        from cloth_splatting_tpu.render import CameraArrays, camera_arrays
        from cloth_splatting_tpu.train.config import Config
        from cloth_splatting_tpu.train.step import Trainer

        fov = 2 * np.arctan(0.4)
        mesh = grid_cloth_mesh(4, 4, size=1.2)
        cfg = Config()
        cfg.opt.lambda_isometric = 0.01
        cfg.opt.lambda_spring = 0.01
        cfg.opt.lambda_rigidity = 0.01
        cfg.opt.k_nearest = 4
        cfg.opt.raster_k_cap = 64
        cfg.opt.raster_k_chunk = 16
        trainer = Trainer(cfg, mesh, jnp.tile(mesh.pos[None], (3, 1, 1)),
                          32, 32, np.tan(fov / 2), np.tan(fov / 2), 2.0)
        rng = np.random.default_rng(0)
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                          capacity=128)
        state = trainer.init_state(rng, params, gstate)
        knn_state = trainer.compute_knn_state(state)
        assert bool(knn_state.valid.any())
        # dead capacity slots never appear as valid neighbors
        alive = np.asarray(state.gstate.alive)
        vidx = np.asarray(knn_state.idx)[np.asarray(knn_state.valid)]
        assert alive[vidx].all()

        cam = Camera.create(R=np.eye(3), t=np.asarray([0.0, 0.0, 3.0]),
                            fovx=fov, fovy=fov, width=32, height=32, time=0.5)
        arrs = [camera_arrays(dataclasses.replace(cam, time=float(t)))
                for t in (0.0, 0.5, 1.0)]
        cams = CameraArrays(*[jnp.stack([getattr(a, f) for a in arrs])
                              for f in CameraArrays._fields])
        gts = jnp.full((3, 3, 32, 32), 0.5, jnp.float32)
        _, m_plain = trainer.step(state, cams, gts, None, sh_degree=0,
                                  static=False)
        _, m_knn = trainer.step(state, cams, gts, None, sh_degree=0,
                                static=False, knn_state=knn_state)
        assert np.isfinite(float(m_knn.loss))
        # the regularizer actually contributes (losses differ)
        assert float(m_knn.loss) != float(m_plain.loss)
