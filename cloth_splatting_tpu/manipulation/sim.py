"""Position-based-dynamics cloth simulator in JAX (PyFleX/SoftGym replacement).

The reference generates data and runs manipulation through the external
PyFleX/SoftGym C++/CUDA stack (SURVEY.md section 2.1: "replace with a
lightweight JAX PBD/spring-mass cloth stepper good enough to regenerate the
sim datasets and run closed-loop planning — MeshNet is the actual dynamics
model being evaluated"). This module is that stepper:

  * particles on a grid with structural / shear / bending distance
    constraints (PBD XPBD-style Jacobi projection, fixed iteration count ->
    jittable with lax.fori_loop),
  * gravity + velocity damping + ground-plane collision,
  * particle grasping: the grasped particle is kinematically driven
    (the reference's ParticleGrasper semantics),
  * coordinates are y-up like PyFleX so downstream axis handling matches the
    reference loaders (meshnet/data_utils.py:252-264 flip_trajectory).

The whole rollout (hundreds of steps x tens of constraint iterations) is one
``lax.scan`` program — the vectorized constraint projection maps onto the
VPU; there is no per-constraint scalar loop anywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ClothParams(NamedTuple):
    dt: float = 0.01
    substeps: int = 4
    iterations: int = 12
    gravity: float = -9.81
    damping: float = 0.995
    stiffness: float = 1.0
    bend_stiffness: float = 0.35
    ground_y: float = 0.0
    friction: float = 0.6


class ClothState(NamedTuple):
    pos: jnp.ndarray   # [N, 3] (y up)
    vel: jnp.ndarray   # [N, 3]


class ClothConstraints(NamedTuple):
    edges: jnp.ndarray       # [C, 2] particle index pairs
    rest_len: jnp.ndarray    # [C]
    stiff: jnp.ndarray       # [C] per-constraint stiffness
    inv_degree: jnp.ndarray  # [N] 1/constraint-degree (Jacobi averaging)


def make_cloth(nx: int = 20, ny: int = 20, size: float = 0.3,
               height: float = 0.25, seed: int = 0,
               params: ClothParams = ClothParams()):
    """A flat cloth grid hovering at ``height`` (y-up). Returns
    (state, constraints, grid_shape)."""
    xs = np.linspace(-size / 2, size / 2, nx)
    zs = np.linspace(-size / 2, size / 2, ny)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    pos = np.stack([gx.ravel(), np.full(nx * ny, height), gz.ravel()], axis=1)

    def pid(i, j):
        return i * ny + j

    edges, stiff = [], []
    for i in range(nx):
        for j in range(ny):
            if i + 1 < nx:
                edges.append((pid(i, j), pid(i + 1, j))); stiff.append(params.stiffness)
            if j + 1 < ny:
                edges.append((pid(i, j), pid(i, j + 1))); stiff.append(params.stiffness)
            if i + 1 < nx and j + 1 < ny:
                edges.append((pid(i, j), pid(i + 1, j + 1))); stiff.append(params.stiffness)
                edges.append((pid(i + 1, j), pid(i, j + 1))); stiff.append(params.stiffness)
            if i + 2 < nx:
                edges.append((pid(i, j), pid(i + 2, j))); stiff.append(params.bend_stiffness)
            if j + 2 < ny:
                edges.append((pid(i, j), pid(i, j + 2))); stiff.append(params.bend_stiffness)

    edges = np.asarray(edges, np.int32)
    rest = np.linalg.norm(pos[edges[:, 0]] - pos[edges[:, 1]], axis=1)
    degree = np.zeros(nx * ny)
    np.add.at(degree, edges[:, 0], 1)
    np.add.at(degree, edges[:, 1], 1)

    state = ClothState(pos=jnp.asarray(pos, jnp.float32),
                       vel=jnp.zeros((nx * ny, 3), jnp.float32))
    cons = ClothConstraints(
        edges=jnp.asarray(edges),
        rest_len=jnp.asarray(rest, jnp.float32),
        stiff=jnp.asarray(stiff, jnp.float32),
        inv_degree=jnp.asarray(1.0 / np.maximum(degree, 1.0), jnp.float32),
    )
    return state, cons, (nx, ny)


def constraints_from_mesh(verts: np.ndarray, faces: np.ndarray,
                          params: ClothParams = ClothParams()
                          ) -> tuple[ClothState, ClothConstraints]:
    """Build PBD state + constraints for an arbitrary triangle mesh:
    structural constraints on the unique face edges, bending constraints
    between the opposite vertices of each interior edge (the two triangles
    sharing it)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    n = verts.shape[0]

    edge_opposite: dict[tuple[int, int], list[int]] = {}
    for tri in faces:
        for i in range(3):
            a, b = int(tri[i]), int(tri[(i + 1) % 3])
            e = (min(a, b), max(a, b))
            edge_opposite.setdefault(e, []).append(int(tri[(i + 2) % 3]))

    edges, stiff = [], []
    for e in sorted(edge_opposite):
        edges.append(e)
        stiff.append(params.stiffness)
    for e, opp in sorted(edge_opposite.items()):
        if len(opp) == 2 and opp[0] != opp[1]:
            edges.append((min(opp), max(opp)))
            stiff.append(params.bend_stiffness)

    edges = np.asarray(edges, np.int32)
    rest = np.linalg.norm(verts[edges[:, 0]] - verts[edges[:, 1]], axis=1)
    degree = np.zeros(n)
    np.add.at(degree, edges[:, 0], 1)
    np.add.at(degree, edges[:, 1], 1)

    state = ClothState(pos=jnp.asarray(verts),
                       vel=jnp.zeros((n, 3), jnp.float32))
    cons = ClothConstraints(
        edges=jnp.asarray(edges),
        rest_len=jnp.asarray(rest, jnp.float32),
        stiff=jnp.asarray(stiff, jnp.float32),
        inv_degree=jnp.asarray(1.0 / np.maximum(degree, 1.0), jnp.float32),
    )
    return state, cons


def _project_constraints(p: jnp.ndarray, cons: ClothConstraints,
                         pinned_mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Jacobi PBD distance-constraint projection (vectorized scatter-add)."""

    def body(_, p):
        d = p[cons.edges[:, 1]] - p[cons.edges[:, 0]]
        dist = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        corr = cons.stiff[:, None] * 0.5 * (dist - cons.rest_len[:, None]) * d / dist
        delta = jnp.zeros_like(p)
        delta = delta.at[cons.edges[:, 0]].add(corr)
        delta = delta.at[cons.edges[:, 1]].add(-corr)
        move = delta * cons.inv_degree[:, None] * 1.5  # over-relaxation
        return p + jnp.where(pinned_mask[:, None], 0.0, move)

    return jax.lax.fori_loop(0, iterations, body, p)


@functools.partial(jax.jit, static_argnames=("params",))
def cloth_step_multi(state: ClothState, cons: ClothConstraints,
                     grasp_idx: jnp.ndarray, grasp_target: jnp.ndarray,
                     grasp_active: jnp.ndarray,
                     params: ClothParams = ClothParams()) -> ClothState:
    """One control step (= params.substeps PBD substeps) with P kinematic
    grasp handles (the multi-picker case of the reference's Picker tool,
    manipulation/action_space/action_space.py:142-208).

    Args:
        grasp_idx: [P] int particle indices (duplicates allowed; last wins).
        grasp_target: [P, 3] world positions each handle moves to (end of step).
        grasp_active: [P] bool.
    """
    n = state.pos.shape[0]
    grasp_idx = jnp.atleast_1d(grasp_idx)
    grasp_target = jnp.reshape(grasp_target, (-1, 3))
    grasp_active = jnp.atleast_1d(grasp_active)
    onehot = jax.nn.one_hot(grasp_idx, n) * grasp_active[:, None]   # [P, N]
    pin = onehot.sum(axis=0) > 0
    sub_dt = params.dt
    start = state.pos[grasp_idx]                                    # [P, 3]

    # inactive handles scatter to an out-of-bounds index and are dropped —
    # a self-write placeholder could clobber an ACTIVE grasp of the same
    # particle (XLA scatter order with duplicate indices is unspecified)
    safe_idx = jnp.where(grasp_active, grasp_idx, n)

    def pin_to(p, target_i):
        return p.at[safe_idx].set(target_i, mode="drop")

    def substep(i, st):
        pos, vel = st
        frac = (i + 1.0) / params.substeps
        target_i = start + (grasp_target - start) * frac            # [P, 3]
        vel = (vel + jnp.asarray([0.0, params.gravity, 0.0]) * sub_dt) * params.damping
        p = pos + vel * sub_dt
        p = pin_to(p, target_i)
        p = _project_constraints(p, cons, pin, params.iterations)
        p = pin_to(p, target_i)
        # ground collision with friction
        below = p[:, 1] < params.ground_y
        p = p.at[:, 1].set(jnp.where(below, params.ground_y, p[:, 1]))
        new_vel = (p - pos) / sub_dt
        new_vel = jnp.where(
            below[:, None],
            new_vel * jnp.asarray([1.0 - params.friction, 1.0, 1.0 - params.friction]),
            new_vel,
        )
        return (p, new_vel)

    pos, vel = jax.lax.fori_loop(0, params.substeps, substep, (state.pos, state.vel))
    return ClothState(pos=pos, vel=vel)


def cloth_step(state: ClothState, cons: ClothConstraints,
               grasp_idx: jnp.ndarray, grasp_target: jnp.ndarray,
               grasp_active: jnp.ndarray, params: ClothParams = ClothParams()
               ) -> ClothState:
    """Single-handle convenience wrapper over :func:`cloth_step_multi`."""
    return cloth_step_multi(
        state, cons,
        jnp.reshape(grasp_idx, (1,)).astype(jnp.int32),
        jnp.reshape(grasp_target, (1, 3)),
        jnp.reshape(grasp_active, (1,)),
        params)


def settle(state: ClothState, cons: ClothConstraints, n_steps: int = 50,
           params: ClothParams = ClothParams()) -> ClothState:
    """Let the cloth fall/settle with no grasp."""
    idx = jnp.zeros((), jnp.int32)
    tgt = state.pos[0]
    for _ in range(n_steps):
        state = cloth_step(state, cons, idx, tgt, jnp.zeros((), bool), params)
    return state
