"""Quaternion / rotation utilities, batched for TPU.

Conventions:
  * Gaussian rotations are stored WXYZ (w first), matching the 3DGS parameter
    layout the reference uses (reference: utils/general_utils.py:81-102).
  * Mesh-deformation relative rotations computed by Kabsch come out as rotation
    matrices and are converted here; composition order matches
    ``roma.quat_composition([static, relative])`` semantics
    (reference: scene_reconstruction/gaussian_mesh.py:171-188), i.e. the
    relative (deformation) rotation is applied AFTER the static one:
    R_total = R_rel @ R_static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions [..., 4] to unit length.

    rsqrt(sumsq + eps) instead of /max(norm, eps): sqrt has an infinite
    gradient at 0, and zero-padded (dead-slot) quaternions would turn the
    whole backward pass NaN via NaN * 0 even though their contributions are
    masked downstream."""
    ss = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(ss + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """WXYZ quaternion [..., 4] -> rotation matrix [..., 3, 3] (normalizes first)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotmat_to_quat(m: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> WXYZ unit quaternion [..., 4].

    Branch-free (selects among the four standard constructions by the largest
    denominator) so it is safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; q_w variant valid when trace is largest, etc.
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, eps))

    sw = safe_sqrt(1.0 + tr)  # = 2w
    qw = jnp.stack([0.5 * sw, (m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw), (m10 - m01) / (2 * sw)], -1)
    sx = safe_sqrt(1.0 + m00 - m11 - m22)  # = 2x
    qx = jnp.stack([(m21 - m12) / (2 * sx), 0.5 * sx, (m01 + m10) / (2 * sx), (m02 + m20) / (2 * sx)], -1)
    sy = safe_sqrt(1.0 - m00 + m11 - m22)  # = 2y
    qy = jnp.stack([(m02 - m20) / (2 * sy), (m01 + m10) / (2 * sy), 0.5 * sy, (m12 + m21) / (2 * sy)], -1)
    sz = safe_sqrt(1.0 - m00 - m11 + m22)  # = 2z
    qz = jnp.stack([(m10 - m01) / (2 * sz), (m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz), 0.5 * sz], -1)

    cond_w = tr > 0.0
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(
        cond_w[..., None],
        qw,
        jnp.where(cond_x[..., None], qx, jnp.where(cond_y[..., None], qy, qz)),
    )
    return quat_normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b of WXYZ quaternions (rotation b applied first)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse (= conjugate) of a unit WXYZ quaternion."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis [..., 3] + angle [...] -> WXYZ quaternion.

    (The reference's meshnet/data_utils.py:460-471 emits XYZW; we keep WXYZ
    everywhere internally and convert at IO boundaries.)
    """
    half = 0.5 * angle
    xyz = axis * jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def rotation_between_normals(na: jnp.ndarray, nb: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Smallest rotation mapping each unit normal na -> nb, as WXYZ quaternion.

    Parity with reference meshnet/data_utils.py:474-491 (vertice_rotation), but
    degenerate parallel-normal cases return identity instead of NaN.
    """
    cross = jnp.cross(na, nb)
    dot = jnp.sum(na * nb, axis=-1)
    angle = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    norm = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    axis = cross / jnp.maximum(norm, eps)
    q = axis_angle_to_quat(axis, angle)
    ident = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(norm > eps, q, ident)


def kabsch_rotation(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Optimal rigid rotation aligning point sets src -> dst (least squares).

    Closed-form Kabsch via SVD of the 3x3 cross-covariance, batched on the MXU.
    Replaces the reference's per-Gaussian ``roma.rigid_points_registration``
    over face triangles (reference: scene_reconstruction/gaussian_mesh.py:186).

    Args:
        src: [..., P, 3] source points (rest-state triangle vertices).
        dst: [..., P, 3] target points (deformed triangle vertices).

    Returns:
        [..., 3, 3] rotation matrices R with ``dst ~ (src - c_s) @ R.T + c_d``.
    """
    src_c = src - jnp.mean(src, axis=-2, keepdims=True)
    dst_c = dst - jnp.mean(dst, axis=-2, keepdims=True)
    # Cross-covariance H = src_c^T dst_c : [..., 3, 3]. f32 accumulation:
    # bf16 inputs (TPU default) perturb the SVD enough to wobble rotations.
    h = jnp.einsum("...pi,...pj->...ij", src_c, dst_c,
                   precision=jax.lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(h, full_matrices=False)
    # Proper rotation: flip the last singular vector if det < 0.
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik",
                                    jnp.swapaxes(vt, -1, -2),
                                    jnp.swapaxes(u, -1, -2),
                                    precision=jax.lax.Precision.HIGHEST))
    flip = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = jnp.einsum("...ji,...j,...jk->...ik", vt, flip,
                   jnp.swapaxes(u, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)
    return r
