"""Elementwise-expanded small-matrix algebra.

XLA lowers BATCHED tiny matmuls (einsums like ``nij,njk->nik`` over 3x3
matrices) catastrophically on TPU: minutes of compile time and ~1000x the
roofline runtime (measured on target hardware: 27 ms for 4k Gaussians'
EWA einsums vs 0.06 ms expanded). Per-Gaussian geometry only ever touches
2x2 / 3x3 / 4x4 matrices, so every product here is written out as scalar
component arithmetic over [N]-shaped lanes — pure VPU code that fuses into
neighboring elementwise ops.

Conventions: batched matrices are [N, r, c]; a trailing ``_shared`` operand
is a single unbatched matrix.
"""

from __future__ import annotations

import jax.numpy as jnp


def bmm33(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] @ [N,3,3]."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(sum(a[:, i, k] * b[:, k, j] for k in range(3)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def bmm33_nt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] @ [N,3,3]^T."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(sum(a[:, i, k] * b[:, j, k] for k in range(3)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def bmv3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] @ [N,3] -> [N,3]."""
    return jnp.stack(
        [sum(m[:, i, k] * v[:, k] for k in range(3)) for i in range(3)], axis=-1
    )


def affine4_shared(points: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Row-vector transform [N,3] -> [N,4]: [p, 1] @ M with one shared [4,4]."""
    cols = []
    for j in range(4):
        cols.append(points[:, 0] * m[0, j] + points[:, 1] * m[1, j]
                    + points[:, 2] * m[2, j] + m[3, j])
    return jnp.stack(cols, axis=-1)


def sym33_from_rs(r: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Covariance R diag(s^2) R^T packed as [N,6] (xx, xy, xz, yy, yz, zz).

    Args:
        r: [N, 3, 3] rotations; s2: [N, 3] squared scales.
    """
    out = []
    for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        out.append(sum(s2[:, k] * r[:, i, k] * r[:, j, k] for k in range(3)))
    return jnp.stack(out, axis=-1)


def sym33_quadform2(a_rows: tuple, sym: jnp.ndarray):
    """(c00, c01, c11) of A S A^T for A [N,2,3] given as two row tuples and a
    packed symmetric S [N,6]."""
    s00, s01, s02, s11, s12, s22 = (sym[:, i] for i in range(6))

    def s_dot(q0, q1, q2):
        return (s00 * q0 + s01 * q1 + s02 * q2,
                s01 * q0 + s11 * q1 + s12 * q2,
                s02 * q0 + s12 * q1 + s22 * q2)

    (a0, a1, a2), (b0, b1, b2) = a_rows
    t0, t1, t2 = s_dot(a0, a1, a2)
    c00 = a0 * t0 + a1 * t1 + a2 * t2
    c01 = b0 * t0 + b1 * t1 + b2 * t2
    u0, u1, u2 = s_dot(b0, b1, b2)
    c11 = b0 * u0 + b1 * u1 + b2 * u2
    return c00, c01, c11
