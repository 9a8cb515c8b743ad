"""Capacity-padded Gaussian field + adaptive density control, fully jittable.

TPU-native redesign of the reference's GaussianModel/MultiGaussianMesh density
control (reference: scene_reconstruction/gaussian_model.py:266-430,
gaussian_mesh.py:336-431). The reference reallocates parameter tensors and
performs optimizer-state surgery (cat/prune) on every densify/prune call; on
TPU that would retrace/recompile each time. Instead:

  * All per-Gaussian arrays live at a fixed CAPACITY ``C`` with an ``alive``
    mask. Rendering, losses and the optimizer always see static shapes.
  * Pruning flips ``alive`` bits. Cloning/splitting writes into free slots
    chosen by a rank-matching scatter (cumsum of masks), the jit-able
    equivalent of ``cat_tensors_to_optimizer``.
  * New/modified slots get their Adam moments zeroed via a generic
    optimizer-state map — the moral equivalent of the reference's
    ``exp_avg``-zeroing surgery.
  * When a densify round would overflow capacity the overflow count is
    reported and the host grows capacity between steps (amortized re-jit,
    capacity rounded to 4096).

The Gaussians here are MESH-ANCHORED (the paper's core representation):
positions are barycentric coordinates on mesh faces, not free xyz
(reference: gaussian_mesh.py:107-262).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.ops.image import inverse_sigmoid
from cloth_splatting_tpu.ops.quaternion import quat_to_rotmat
from cloth_splatting_tpu.ops.sh import rgb_to_sh

CAPACITY_ROUND = 512


class GaussianParams(NamedTuple):
    """Trainable per-Gaussian parameters at capacity C (raw, pre-activation)."""

    face_bary: jnp.ndarray      # [C, 3] barycentric coords (normalized on use)
    face_offset: jnp.ndarray    # [C, 1] normal offset (kept for parity; unused)
    features_dc: jnp.ndarray    # [C, 1, 3] SH DC
    features_rest: jnp.ndarray  # [C, K-1, 3] SH rest
    scaling: jnp.ndarray        # [C, 3] log-scales
    rotation: jnp.ndarray       # [C, 4] WXYZ quaternion (unnormalized)
    opacity: jnp.ndarray        # [C, 1] logit opacity


class GaussianState(NamedTuple):
    """Non-trainable bookkeeping at capacity C."""

    face_ids: jnp.ndarray       # [C] int32 face assignment
    alive: jnp.ndarray          # [C] bool
    max_radii2d: jnp.ndarray    # [C] float, running max screen radius
    grad_accum: jnp.ndarray     # [C] accumulated viewspace-grad norms
    denom: jnp.ndarray          # [C] accumulation counts


class Mesh(NamedTuple):
    """A triangle mesh (static topology) backing the Gaussians."""

    pos: jnp.ndarray          # [V, 3] rest-state vertex positions
    faces: jnp.ndarray        # [F, 3] int32
    edge_index: jnp.ndarray   # [2, E] int32 (undirected, both directions or single; as loaded)
    edge_norm: jnp.ndarray    # [E, 1] rest-state edge lengths
    normals: jnp.ndarray      # [V, 3] area-weighted vertex normals


def compute_vertex_normals(pos: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals (parity with torch_geometric
    GenerateMeshNormals used at gaussian_mesh.py:199-201)."""
    v0, v1, v2 = pos[faces[:, 0]], pos[faces[:, 1]], pos[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted face normals
    vn = jnp.zeros_like(pos)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    norm = jnp.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / jnp.maximum(norm, 1e-12)


def compute_edge_features(pos: jnp.ndarray, edge_index: jnp.ndarray):
    """(displacement [E,3], norm [E,1]) for edges dst-src
    (parity: meshnet/data_utils.py:443-448)."""
    disp = pos[edge_index[1]] - pos[edge_index[0]]
    norm = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    return disp, norm


def barycentric_coordinates(points: jnp.ndarray, triangles: jnp.ndarray,
                            eps: float = 1e-12) -> jnp.ndarray:
    """Barycentric coords of points [N,3] wrt triangles [N,3,3]
    (parity: meshnet/data_utils.py:494-530)."""
    a, b, c = triangles[:, 0], triangles[:, 1], triangles[:, 2]
    ab, ac, ap = b - a, c - a, points - a
    d00 = jnp.sum(ac * ac, -1)
    d01 = jnp.sum(ac * ab, -1)
    d02 = jnp.sum(ac * ap, -1)
    d11 = jnp.sum(ab * ab, -1)
    d12 = jnp.sum(ab * ap, -1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
    v = (d11 * d02 - d01 * d12) / denom
    w = (d00 * d12 - d01 * d02) / denom
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=1)


# --------------------------------------------------------------------------- #
# Activations
# --------------------------------------------------------------------------- #

def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)[:, 0]


def get_features(params: GaussianParams) -> jnp.ndarray:
    """[C, K, 3] full SH stack."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def num_alive(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.alive)


# --------------------------------------------------------------------------- #
# Initialization
# --------------------------------------------------------------------------- #

def round_capacity(n: int) -> int:
    return max(CAPACITY_ROUND, int(np.ceil(n / CAPACITY_ROUND)) * CAPACITY_ROUND)


def init_from_mesh(
    rng: np.random.Generator,
    mesh: Mesh,
    sh_degree: int,
    gaussian_init_factor: int = 2,
    capacity: int | None = None,
    knn_scale_fn=None,
) -> tuple[GaussianParams, GaussianState]:
    """Initialize ``gaussian_init_factor`` Gaussians per face.

    Behavioral parity with reference gaussian_mesh.py:211-262: bary =
    clip(N(1/3, 0.05), 0, 1) renormalized, random near-black SH DC, identity
    quats, opacity logit of 0.1, log-scales from sqrt(mean 3-NN sq dist).

    Host-side (numpy RNG) since it runs once per scene.
    """
    faces = np.asarray(mesh.faces)
    n_faces = faces.shape[0]
    n = gaussian_init_factor * n_faces
    cap = capacity or round_capacity(n)
    k = (sh_degree + 1) ** 2

    bary = np.full((cap, 3), 1.0 / 3.0, dtype=np.float32)
    if gaussian_init_factor > 1:
        noise = rng.normal(1.0 / 3.0, 0.05, size=(n, 3)).astype(np.float32)
        bary[:n] = np.clip(noise, 0.0, 1.0)
        bary[:n] /= np.maximum(bary[:n].sum(axis=1, keepdims=True), 1e-8)

    face_ids = np.zeros(cap, dtype=np.int32)
    face_ids[:n] = np.sort(np.tile(np.arange(n_faces, dtype=np.int32), gaussian_init_factor))

    shs = rng.random((n, 3)).astype(np.float32) / 255.0
    fdc = np.zeros((cap, 1, 3), dtype=np.float32)
    fdc[:n, 0] = np.asarray(rgb_to_sh(shs))
    frest = np.zeros((cap, k - 1, 3), dtype=np.float32)

    rots = np.zeros((cap, 4), dtype=np.float32)
    rots[:, 0] = 1.0

    opac = np.full((cap, 1), float(inverse_sigmoid(jnp.asarray(0.1))), dtype=np.float32)

    # scales from mean 3-NN squared distance of the initial gaussian positions
    pos_v = np.asarray(mesh.pos)
    tri = pos_v[faces[face_ids[:n]]]                       # [n, 3, 3]
    pts = np.einsum("nb,nbx->nx", bary[:n], tri)
    if knn_scale_fn is None:
        from cloth_splatting_tpu.ops.knn import mean_knn_sq_dist
        dist2 = np.asarray(mean_knn_sq_dist(jnp.asarray(pts)))
    else:
        dist2 = np.asarray(knn_scale_fn(pts))
    scales = np.zeros((cap, 3), dtype=np.float32)
    scales[:n] = np.log(np.sqrt(np.clip(dist2, 1e-7, None)))[:, None]

    alive = np.zeros(cap, dtype=bool)
    alive[:n] = True

    params = GaussianParams(
        face_bary=jnp.asarray(bary),
        face_offset=jnp.zeros((cap, 1), jnp.float32),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(frest),
        scaling=jnp.asarray(scales),
        rotation=jnp.asarray(rots),
        opacity=jnp.asarray(opac),
    )
    state = GaussianState(
        face_ids=jnp.asarray(face_ids),
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros(cap, jnp.float32),
        grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    return params, state


# --------------------------------------------------------------------------- #
# Mesh anchoring: positions / rotations from (deformed) vertices
# --------------------------------------------------------------------------- #

def gaussian_positions(params: GaussianParams, state: GaussianState, mesh: Mesh,
                       vertices: jnp.ndarray | None = None) -> jnp.ndarray:
    """Barycentric positions on (possibly deformed) mesh faces
    (parity: gaussian_mesh.py:151-169)."""
    verts = mesh.pos if vertices is None else vertices
    tri = verts[mesh.faces[state.face_ids]]                   # [C, 3, 3]
    bsum = jnp.sum(params.face_bary, axis=1, keepdims=True)
    norm_bary = params.face_bary / jnp.where(jnp.abs(bsum) < 1e-8, 1e-8, bsum)
    # expanded barycentric blend (no batched matmul; see ops/smallmat.py)
    return (norm_bary[:, 0:1] * tri[:, 0]
            + norm_bary[:, 1:2] * tri[:, 1]
            + norm_bary[:, 2:3] * tri[:, 2])


def _triangle_frames(tri: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Orthonormal frame per triangle [N, 3, 3] (columns: edge, in-plane
    perpendicular, normal). rsqrt(ss + eps) normalization keeps gradients
    finite for degenerate triangles (see quat_normalize)."""
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = jnp.cross(e1, e2)
    e1 = e1 * jax.lax.rsqrt(jnp.sum(e1 * e1, -1, keepdims=True) + eps)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, -1, keepdims=True) + eps)
    t = jnp.cross(n, e1)
    return jnp.stack([e1, t, n], axis=-1)  # columns


def face_rotations(mesh: Mesh, deformed_vertices: jnp.ndarray) -> jnp.ndarray:
    """Per-face rigid rotation rest->deformed as WXYZ quaternions.

    Replaces per-Gaussian ``roma.rigid_points_registration`` (reference:
    gaussian_mesh.py:186) with a per-FACE triangle-frame alignment gathered to
    Gaussians: R = F_deformed @ F_rest^T where F is the orthonormal
    (edge, in-plane-perp, normal) frame. Exact for rigid face motion,
    smooth and differentiable everywhere (SVD-based Kabsch has undefined
    gradients at the repeated singular values every planar triangle
    produces), and runs as elementwise-expanded 3x3 products on the VPU
    (full f32, fuses with neighbors; see ops/smallmat.py) instead of N
    SVDs.
    """
    from cloth_splatting_tpu.ops.quaternion import rotmat_to_quat
    from cloth_splatting_tpu.ops.smallmat import bmm33_nt

    rest = mesh.pos[mesh.faces]            # [F, 3, 3]
    deformed = deformed_vertices[mesh.faces]
    f_rest = _triangle_frames(rest)
    f_def = _triangle_frames(deformed)
    r = bmm33_nt(f_def, f_rest)            # F_def @ F_rest^T
    return rotmat_to_quat(r)


def gaussian_rotations(params: GaussianParams, state: GaussianState, mesh: Mesh,
                       deformed_vertices: jnp.ndarray | None = None) -> jnp.ndarray:
    """World-frame WXYZ rotations: face rigid rotation composed with the
    static per-Gaussian quaternion (parity: gaussian_mesh.py:171-188)."""
    from cloth_splatting_tpu.ops.quaternion import quat_multiply, quat_normalize

    q_static = quat_normalize(params.rotation)
    if deformed_vertices is None:
        return q_static
    q_face = face_rotations(mesh, deformed_vertices)          # [F, 4]
    return quat_multiply(q_face[state.face_ids], q_static)


# --------------------------------------------------------------------------- #
# Density control (jittable, static shapes)
# --------------------------------------------------------------------------- #

def _rank_match_targets(src_mask: jnp.ndarray, free_mask: jnp.ndarray):
    """For each selected source (by rank) pick the free slot of equal rank.

    Returns (src_for_slot [C] int32, active [C] bool): for every capacity slot
    ``i`` that should receive a copy, ``src_for_slot[i]`` is the source index;
    ``active[i]`` marks receiving slots. Overflow (more sources than free
    slots) is silently dropped (callers report it).
    """
    c = src_mask.shape[0]
    src_rank = jnp.cumsum(src_mask) - 1                   # rank of each source
    free_rank = jnp.cumsum(free_mask) - 1
    n_src = jnp.sum(src_mask)
    # src_of_rank[r] = index of the r-th selected source
    src_of_rank = jnp.full((c,), -1, dtype=jnp.int32)
    scatter_idx = jnp.where(src_mask, src_rank, c)
    src_of_rank = src_of_rank.at[scatter_idx].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop"
    )
    take = jnp.clip(free_rank, 0, c - 1)
    src_for_slot = src_of_rank[take]
    active = free_mask & (free_rank < n_src) & (src_for_slot >= 0)
    return jnp.where(active, src_for_slot, 0), active


def _copy_rows(params, src: jnp.ndarray, dst_active: jnp.ndarray,
               overrides: dict[str, jnp.ndarray] | None = None):
    """Copy parameter rows src->slot wherever dst_active, with optional
    per-field overrides (already gathered to slot order). Generic over any
    NamedTuple of capacity-leading arrays (shared with the free-xyz model)."""
    overrides = overrides or {}

    def copy(name, arr):
        new = overrides.get(name, arr[src])
        mask = dst_active.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(mask, new, arr)

    return type(params)(**{k: copy(k, v) for k, v in params._asdict().items()})


class DensifyResult(NamedTuple):
    params: GaussianParams
    state: GaussianState
    touched: jnp.ndarray   # [C] bool — slots whose Adam moments must be zeroed
    overflow: jnp.ndarray  # scalar int — selected Gaussians that found no slot


def densify_clone(params: GaussianParams, state: GaussianState,
                  grads: jnp.ndarray, grad_threshold, percent_dense: float,
                  scene_extent) -> DensifyResult:
    """Clone small high-gradient Gaussians into free slots
    (parity: gaussian_mesh.py:414-431)."""
    max_scale = jnp.max(get_scaling(params), axis=1)
    sel = (grads >= grad_threshold) & (max_scale <= percent_dense * scene_extent) & state.alive
    free = ~state.alive
    src, active = _rank_match_targets(sel, free)
    new_params = _copy_rows(params, src, active)
    new_state = state._replace(
        face_ids=jnp.where(active, state.face_ids[src], state.face_ids),
        alive=state.alive | active,
        max_radii2d=jnp.where(active, 0.0, state.max_radii2d),
    )
    overflow = jnp.maximum(jnp.sum(sel) - jnp.sum(free), 0)
    return DensifyResult(new_params, new_state, active, overflow)


def densify_split(params: GaussianParams, state: GaussianState, mesh: Mesh,
                  grads: jnp.ndarray, grad_threshold, percent_dense: float,
                  scene_extent, rng_key: jax.Array) -> DensifyResult:
    """Split large high-gradient Gaussians into 2 jittered children
    (parity: gaussian_mesh.py:379-412 with N=2: one child replaces the parent
    slot, the sibling lands in a free slot; scales shrink by 1/(0.8*N), new
    barycentric coords are recomputed against the parent face)."""
    n_split = 2
    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=1)
    sel = (grads >= grad_threshold) & (max_scale > percent_dense * scene_extent) & state.alive

    from cloth_splatting_tpu.ops.smallmat import bmv3

    xyz = gaussian_positions(params, state, mesh)
    rots = quat_to_rotmat(params.rotation)
    eps = jax.random.normal(rng_key, (n_split,) + scaling.shape)  # [2, C, 3]
    jitter = jnp.stack([bmv3(rots, eps[i] * scaling) for i in range(n_split)])
    child_xyz = xyz[None] + jitter                                 # [2, C, 3]
    tri = mesh.pos[mesh.faces[state.face_ids]]                     # [C, 3, 3]
    child_bary = jax.vmap(lambda p: barycentric_coordinates(p, tri))(child_xyz)
    new_scaling = jnp.log(scaling / (0.8 * n_split))

    # Child 0 overwrites the parent slot.
    def in_place(name, arr, child0):
        mask = sel.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(mask, child0, arr)

    p1 = GaussianParams(
        face_bary=in_place("face_bary", params.face_bary, child_bary[0]),
        face_offset=params.face_offset,
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        scaling=in_place("scaling", params.scaling, new_scaling),
        rotation=params.rotation,
        opacity=params.opacity,
    )

    # Child 1 goes to a free slot.
    free = ~state.alive
    src, active = _rank_match_targets(sel, free)
    overrides = {
        "face_bary": child_bary[1][src],
        "scaling": new_scaling[src],
    }
    p2 = _copy_rows(p1, src, active, overrides)
    new_state = state._replace(
        face_ids=jnp.where(active, state.face_ids[src], state.face_ids),
        alive=state.alive | active,
        max_radii2d=jnp.where(active | sel, 0.0, state.max_radii2d),
    )
    touched = active | sel
    overflow = jnp.maximum(jnp.sum(sel) - jnp.sum(free), 0)
    return DensifyResult(p2, new_state, touched, overflow)


def prune(params: GaussianParams, state: GaussianState, min_opacity,
          scene_extent, max_screen_size: float | None) -> GaussianState:
    """Kill low-opacity / oversized Gaussians (parity: gaussian_model.py:408-416)."""
    mask = get_opacity(params) < min_opacity
    if max_screen_size is not None:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = jnp.max(get_scaling(params), axis=1) > 0.1 * scene_extent
        mask = mask | big_vs | big_ws
    return state._replace(alive=state.alive & ~mask)


def reset_opacity(params: GaussianParams) -> tuple[GaussianParams, jnp.ndarray]:
    """Clamp all opacities to <= 0.01 (parity: gaussian_model.py:214-217).
    Returns (params, touched mask for moment zeroing)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01))
    return params._replace(opacity=new_op), jnp.ones(params.opacity.shape[0], bool)


def add_densification_stats(state: GaussianState, xy_grad_norm: jnp.ndarray,
                            radii: jnp.ndarray, visibility: jnp.ndarray) -> GaussianState:
    """Accumulate viewspace gradient norms + running max radii
    (parity: gaussian_model.py:427-430, train_utils.py:326-328)."""
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(visibility, xy_grad_norm, 0.0),
        denom=state.denom + visibility.astype(state.denom.dtype),
        max_radii2d=jnp.where(visibility, jnp.maximum(state.max_radii2d, radii),
                              state.max_radii2d),
    )


def grow_state_arrays(params, gstate, g_opt, new_cap: int):
    """Grow (params, gstate, Adam moments) to ``new_cap`` with dead slots;
    dead rotations get identity quaternions (zero quats are degenerate even
    with NaN-safe normalization). The ONE capacity-growth implementation —
    Trainer.grow_capacity, ShardedTrainer.place_state and the scene-parallel
    sweep all route here. No-op when new_cap <= current capacity."""
    old_cap = params.face_bary.shape[0]
    if new_cap <= old_cap:
        return params, gstate, g_opt
    grown = grow_arrays(params, old_cap, new_cap)
    grown = grown._replace(rotation=grown.rotation.at[old_cap:, 0].set(1.0))
    return (grown, grow_arrays(gstate, old_cap, new_cap),
            grow_arrays(g_opt, old_cap, new_cap))


def grow_arrays(tree: Any, old_cap: int, new_cap: int) -> Any:
    """Pad every array leaf whose leading dim equals old_cap to new_cap
    (zeros). Used for host-side capacity growth after densify overflow;
    dead slots are masked by ``alive`` everywhere downstream."""

    def pad(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == old_cap:
            widths = [(0, new_cap - old_cap)] + [(0, 0)] * (leaf.ndim - 1)
            return jnp.pad(leaf, widths)
        return leaf

    return jax.tree_util.tree_map(pad, tree)


def zero_opt_rows(opt_state: Any, touched: jnp.ndarray, capacity: int) -> Any:
    """Zero optimizer-moment rows for touched slots.

    Generic over the optax state tree: any float array whose leading dim
    equals the Gaussian capacity is treated as a per-Gaussian moment and
    masked. Equivalent to the reference's exp_avg/exp_avg_sq surgery
    (gaussian_model.py:281-341)."""

    def fix(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == capacity \
                and jnp.issubdtype(leaf.dtype, jnp.floating):
            mask = touched.reshape((-1,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, 0.0, leaf)
        return leaf

    return jax.tree_util.tree_map(fix, opt_state)
