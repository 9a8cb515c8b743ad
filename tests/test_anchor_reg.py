"""Anchor regularizer: penalize |deformed - predicted| mesh drift.

Round-5 measurement (docs/results/hwq_r05d.json mte_decompose_iso_zn): the
zero-noise isometric parity run's 20.2 mm MTE is dominated by a 17.2 mm
mean nearest-Gaussian match offset — the fitted mesh drifts coherently off
the (exact) predicted surface, a mode every reference regularizer is blind
to because they are all temporal-relative (deform-mag, rigid edges,
momentum). lambda_anchor (default 0 = reference parity) pins the residual
simulator to its GNN predictions directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.models.gaussians import Mesh
from cloth_splatting_tpu.train.losses import regularization


@pytest.fixture()
def mesh():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    edges = np.array([[0, 1], [0, 2], [1, 3], [2, 3]], np.int32).T
    norm = np.linalg.norm(pos[edges[1]] - pos[edges[0]], axis=-1)
    return Mesh(pos=jnp.asarray(pos), faces=jnp.zeros((2, 3), jnp.int32),
                edge_index=jnp.asarray(edges),
                edge_norm=jnp.asarray(norm[:, None]),
                normals=jnp.zeros((4, 3), jnp.float32))


def _verts(mesh, lift=0.0):
    v = jnp.broadcast_to(mesh.pos[None], (3, 4, 3))
    return v + jnp.array([0.0, 0.0, lift])


class TestAnchorRegularizer:
    def test_default_off_matches_prior_behavior(self, mesh):
        v = _verts(mesh, lift=0.05)
        base = _verts(mesh)
        with_anchor_off = regularization(v, mesh, 0.01, 0.3, 0.1,
                                         lambda_anchor=0.0, anchor_base=base)
        legacy = regularization(v, mesh, 0.01, 0.3, 0.1)
        assert float(with_anchor_off) == float(legacy)

    def test_coherent_drift_invisible_to_reference_regs(self, mesh):
        # a constant lift of the whole mesh across all times changes NO
        # reference regularizer (frame diffs, edge lengths, momentum all
        # relative) — the failure mode the anchor exists for
        drifted = _verts(mesh, lift=0.05)
        on_base = _verts(mesh)
        assert float(regularization(drifted, mesh, 0.01, 0.3, 0.1)) == \
            pytest.approx(float(regularization(on_base, mesh, 0.01, 0.3, 0.1)))

    def test_anchor_penalizes_drift(self, mesh):
        base = _verts(mesh)
        drifted = _verts(mesh, lift=0.05)
        l_drift = regularization(drifted, mesh, 0.0, 0.0, 0.0,
                                 lambda_anchor=1.0, anchor_base=base)
        l_home = regularization(base, mesh, 0.0, 0.0, 0.0,
                                lambda_anchor=1.0, anchor_base=base)
        assert float(l_drift) == pytest.approx(0.05, rel=1e-4)
        assert float(l_home) < 1e-5

    def test_anchor_gradient_points_home(self, mesh):
        base = _verts(mesh)
        drifted = _verts(mesh, lift=0.05)
        g = jax.grad(lambda v: regularization(
            v, mesh, 0.0, 0.0, 0.0, lambda_anchor=1.0, anchor_base=base))(
                drifted)
        # descending the anchor loss moves the lifted z back toward base
        assert float(jnp.max(g[..., 2])) > 0.0
        assert float(jnp.max(jnp.abs(g[..., :2]))) < 1e-6

    def test_static_phase_disabled(self, mesh):
        v = _verts(mesh, lift=0.05)
        out = regularization(v, mesh, 0.01, 0.3, 0.1, static=True,
                             lambda_anchor=1.0, anchor_base=_verts(mesh))
        assert float(out) == 0.0
