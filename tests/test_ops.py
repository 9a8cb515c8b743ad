"""Golden-value unit tests for the math core (SURVEY.md section 4 layer 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.ops import camera as cam_ops
from cloth_splatting_tpu.ops import image as img_ops
from cloth_splatting_tpu.ops import knn as knn_ops
from cloth_splatting_tpu.ops import quaternion as quat_ops
from cloth_splatting_tpu.ops import sh as sh_ops
from cloth_splatting_tpu.ops.ssim import ssim
from cloth_splatting_tpu.train.schedules import expon_lr


class TestSH:
    def test_degree0_constant(self):
        sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (5, 1))
        out = sh_ops.eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, sh_ops.C0, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(rgb)), rgb, rtol=1e-6)

    def test_degree1_direction_dependence(self):
        # coefficient on the z band (index 2) scales with +C1 * z
        sh = jnp.zeros((1, 4, 1)).at[0, 2, 0].set(1.0)
        up = sh_ops.eval_sh(1, sh, jnp.asarray([[0.0, 0.0, 1.0]]))
        down = sh_ops.eval_sh(1, sh, jnp.asarray([[0.0, 0.0, -1.0]]))
        np.testing.assert_allclose(up[0, 0], sh_ops.C1, rtol=1e-6)
        np.testing.assert_allclose(down[0, 0], -sh_ops.C1, rtol=1e-6)

    def test_all_degrees_shapes(self):
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        sh = jnp.asarray(np.random.default_rng(1).normal(size=(7, 25, 3)))
        for deg in range(5):
            out = sh_ops.eval_sh(deg, sh, dirs)
            assert out.shape == (7, 3)

    def test_orthonormality(self):
        # Monte-Carlo check that the basis is orthonormal on the sphere.
        rng = np.random.default_rng(2)
        d = rng.normal(size=(200_000, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        basis = np.asarray(sh_ops.sh_basis(2, jnp.asarray(d)))
        gram = basis.T @ basis / d.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(9), atol=0.15)


class TestQuaternion:
    def test_identity(self):
        q = jnp.asarray([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(quat_ops.quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=(64, 4)).astype(np.float32)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        q = np.where(q[:, :1] < 0, -q, q)  # canonical hemisphere
        m = quat_ops.quat_to_rotmat(jnp.asarray(q))
        q2 = quat_ops.rotmat_to_quat(m)
        np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), axis=-1)), 1.0, atol=1e-4)

    def test_multiply_matches_matmul(self):
        rng = np.random.default_rng(4)
        a = quat_ops.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), dtype=jnp.float32))
        b = quat_ops.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), dtype=jnp.float32))
        m_ab = quat_ops.quat_to_rotmat(quat_ops.quat_multiply(a, b))
        m_sep = jnp.einsum("nij,njk->nik", quat_ops.quat_to_rotmat(a), quat_ops.quat_to_rotmat(b))
        np.testing.assert_allclose(m_ab, m_sep, atol=1e-5)

    def test_kabsch_recovers_rotation(self):
        rng = np.random.default_rng(5)
        q = quat_ops.quat_normalize(jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32))
        R = quat_ops.quat_to_rotmat(q)
        src = jnp.asarray(rng.normal(size=(16, 3, 3)), dtype=jnp.float32)
        t = jnp.asarray(rng.normal(size=(16, 1, 3)), dtype=jnp.float32)
        dst = jnp.einsum("nij,npj->npi", R, src) + t
        R_est = quat_ops.kabsch_rotation(src, dst)
        np.testing.assert_allclose(R_est, R, atol=1e-4)

    def test_kabsch_proper_rotation(self):
        rng = np.random.default_rng(6)
        src = jnp.asarray(rng.normal(size=(8, 3, 3)), dtype=jnp.float32)
        dst = jnp.asarray(rng.normal(size=(8, 3, 3)), dtype=jnp.float32)
        R = quat_ops.kabsch_rotation(src, dst)
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_rotation_between_normals(self):
        na = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        nb = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        q = quat_ops.rotation_between_normals(na, nb)
        rotated = jnp.einsum("nij,nj->ni", quat_ops.quat_to_rotmat(q), na)
        np.testing.assert_allclose(rotated, nb, atol=1e-5)


class TestCamera:
    def test_projection_matrix_golden(self):
        import math
        P = cam_ops.projection_matrix(0.01, 100.0, math.radians(60), math.radians(60))
        tan30 = math.tan(math.radians(30))
        np.testing.assert_allclose(P[0, 0], 0.01 / (tan30 * 0.01), rtol=1e-6)
        np.testing.assert_allclose(P[2, 2], 100.0 / (100.0 - 0.01), rtol=1e-6)
        np.testing.assert_allclose(P[3, 2], 1.0)

    def test_fov_focal_roundtrip(self):
        fov = 0.8
        np.testing.assert_allclose(cam_ops.focal2fov(cam_ops.fov2focal(fov, 800), 800), fov, rtol=1e-9)

    def test_center_projection(self):
        # A camera at origin looking down +z projects the optical axis to image center.
        import math
        cam = cam_ops.Camera.create(
            R=np.eye(3), t=np.zeros(3), fovx=math.radians(60), fovy=math.radians(60),
            width=100, height=100,
        )
        pt = jnp.asarray([[0.0, 0.0, 5.0]])
        px = cam_ops.project_points(pt, jnp.asarray(cam.full_proj), 100, 100)
        np.testing.assert_allclose(px, [[49.5, 49.5]], atol=1e-3)

    def test_camera_center(self):
        rng = np.random.default_rng(7)
        import math
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = np.asarray(quat_ops.quat_to_rotmat(jnp.asarray(q[None]))[0])
        t = rng.normal(size=3)
        cam = cam_ops.Camera.create(R=R.T, t=t, fovx=1.0, fovy=1.0, width=64, height=64)
        # world->view of the camera center must be the origin
        hom = np.append(cam.camera_center, 1.0)
        np.testing.assert_allclose((hom @ cam.world_view)[:3], 0.0, atol=1e-5)


class TestImageOps:
    def test_psnr_golden(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        np.testing.assert_allclose(img_ops.psnr(a, b), 20.0, rtol=1e-5)

    def test_l1_masked(self):
        a, b = jnp.ones((3, 4, 4)), jnp.zeros((3, 4, 4))
        mask = jnp.zeros((1, 4, 4)).at[:, :2].set(1.0)
        np.testing.assert_allclose(img_ops.l1_loss(a, b, mask), 0.5, rtol=1e-6)

    def test_ssim_identical(self):
        img = jnp.asarray(np.random.default_rng(8).random((3, 32, 32)), dtype=jnp.float32)
        np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-4)

    def test_ssim_vs_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(9)
        a = rng.random((1, 3, 33, 37)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

        # reference torch SSIM (same formulation as utils/loss_utils.py)
        def torch_ssim(x, y):
            win = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
            win = win / win.sum()
            w2d = np.outer(win, win).astype(np.float32)
            w = torch.tensor(w2d).expand(3, 1, 11, 11).contiguous()
            x, y = torch.tensor(x), torch.tensor(y)
            mu1 = F.conv2d(x, w, padding=5, groups=3)
            mu2 = F.conv2d(y, w, padding=5, groups=3)
            s1 = F.conv2d(x * x, w, padding=5, groups=3) - mu1**2
            s2 = F.conv2d(y * y, w, padding=5, groups=3) - mu2**2
            s12 = F.conv2d(x * y, w, padding=5, groups=3) - mu1 * mu2
            c1, c2 = 0.01**2, 0.03**2
            m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
            return m.mean().item()

        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(ours, torch_ssim(a, b), atol=1e-5)


class TestKNN:
    def test_small_exact(self):
        pts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 4]])
        d2, idx = knn_ops.knn(pts, k=2, chunk=4)
        np.testing.assert_allclose(d2[0], [1.0, 4.0], rtol=1e-6)
        assert idx[0, 0] == 1 and idx[0, 1] == 2

    def test_mean_knn_matches_scipy(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(10)
        pts = rng.random((500, 3)).astype(np.float32)
        tree = cKDTree(pts)
        d, _ = tree.query(pts, k=4)
        expected = (d[:, 1:] ** 2).mean(axis=1)
        ours = np.asarray(knn_ops.mean_knn_sq_dist(jnp.asarray(pts), k=3))
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-6)

    def test_chunk_boundary(self):
        rng = np.random.default_rng(11)
        pts = jnp.asarray(rng.random((100, 3)), dtype=jnp.float32)
        d_a, _ = knn_ops.knn(pts, k=3, chunk=32)
        d_b, _ = knn_ops.knn(pts, k=3, chunk=128)
        np.testing.assert_allclose(d_a, d_b, rtol=1e-5)

    def test_far_from_origin(self):
        """Tight cluster at a large world offset: the |q|^2 - 2q.p + |p|^2
        expansion cancels catastrophically without centroid subtraction."""
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(12)
        local = rng.random((300, 3)).astype(np.float32) * 0.05
        pts = local + np.asarray([50.0, -30.0, 80.0], np.float32)
        tree = cKDTree(local)  # exact distances from the offset-free cloud
        d, _ = tree.query(local, k=4)
        expected = (d[:, 1:] ** 2).mean(axis=1)
        ours = np.asarray(knn_ops.mean_knn_sq_dist(jnp.asarray(pts), k=3))
        np.testing.assert_allclose(ours, expected, rtol=1e-2)

    def test_matmul_precision_is_f32(self):
        """The distance cross-term must request HIGHEST precision: on TPU the
        default feeds bf16 into the MXU, and the rounding noise (~|q||p|/256)
        swamps true nearest-neighbor d^2 at unit scene scale — measured as a
        5% Gaussian scale-init corruption that capped the parity fit. Guard
        the lowered IR so the annotation cannot silently regress."""
        pts = jnp.zeros((8, 3), jnp.float32)
        txt = jax.jit(lambda p: knn_ops.knn(p, k=3, chunk=8)).lower(pts).as_text()
        assert "HIGHEST" in txt


class TestSchedules:
    def test_expon_lr_endpoints(self):
        lr = lambda s: float(expon_lr(s, 1e-2, 1e-4, max_steps=1000))
        np.testing.assert_allclose(lr(0), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(lr(1000), 1e-4, rtol=1e-5)
        np.testing.assert_allclose(lr(500), 1e-3, rtol=1e-5)  # log-linear midpoint

    def test_delay(self):
        v = float(expon_lr(0, 1e-2, 1e-4, lr_delay_steps=100, lr_delay_mult=0.1, max_steps=1000))
        np.testing.assert_allclose(v, 1e-3, rtol=1e-5)

    def test_negative_step_disabled(self):
        assert float(expon_lr(-5, 1e-2, 1e-4)) == 0.0
