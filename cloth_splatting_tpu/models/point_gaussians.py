"""Free-xyz point-cloud Gaussian model (plain 3DGS fits).

The reference's base ``GaussianModel`` (scene_reconstruction/gaussian_model.py:25-430)
parameterizes positions directly as trainable xyz — the path its legacy
COLMAP / D-NeRF loaders feed. The mesh-anchored variant in
``models/gaussians.py`` is the cloth flagship; this module is the free-xyz
sibling for static/legacy scenes, reusing the same capacity-padded density
control design (rank-matched clone/split into free slots, jittable, no
dynamic shapes).

Init parity with gaussian_model.py:124-147: SH DC from point colors, scales
``log(sqrt(clamp(mean 3-NN sq dist, 1e-7)))`` (the distCUDA2 contract),
identity quats, opacity logit 0.1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.models.gaussians import (
    _copy_rows,
    _rank_match_targets,
    round_capacity,
)
from cloth_splatting_tpu.ops.image import inverse_sigmoid
from cloth_splatting_tpu.ops.quaternion import quat_to_rotmat
from cloth_splatting_tpu.ops.sh import rgb_to_sh
from cloth_splatting_tpu.ops.smallmat import bmv3


class PointGaussianParams(NamedTuple):
    """Trainable per-Gaussian parameters at capacity C (raw)."""

    xyz: jnp.ndarray            # [C, 3] positions (directly trainable)
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3] log-scales
    rotation: jnp.ndarray       # [C, 4] WXYZ quaternion
    opacity: jnp.ndarray        # [C, 1] logit opacity


class PointGaussianState(NamedTuple):
    alive: jnp.ndarray          # [C] bool
    max_radii2d: jnp.ndarray    # [C]
    grad_accum: jnp.ndarray     # [C]
    denom: jnp.ndarray          # [C]


def get_scaling(params: PointGaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_opacity(params: PointGaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_features(params: PointGaussianParams) -> jnp.ndarray:
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def init_from_point_cloud(rng: np.random.Generator, points: np.ndarray,
                          colors: np.ndarray | None, sh_degree: int,
                          capacity: int | None = None,
                          ) -> tuple[PointGaussianParams, PointGaussianState]:
    """create_from_pcd parity (gaussian_model.py:124-147)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    cap = capacity or round_capacity(n)
    k = (sh_degree + 1) ** 2

    if colors is None:
        # D-NeRF synthetic convention (dataset_readers.py:424-427): random
        # SH COEFFS in [0, 1/255] -> colors = SH2RGB(shs) ~ mid-gray; treating
        # rand/255 as RGB would initialize near-black (rgb_to_sh(0.002) = -1.77)
        from cloth_splatting_tpu.ops.sh import sh_to_rgb
        shs = rng.random((n, 3)).astype(np.float32) / 255.0
        colors = np.asarray(sh_to_rgb(jnp.asarray(shs)))
    fdc = np.zeros((cap, 1, 3), np.float32)
    fdc[:n, 0] = np.asarray(rgb_to_sh(jnp.asarray(colors, jnp.float32)))
    frest = np.zeros((cap, k - 1, 3), np.float32)

    from cloth_splatting_tpu.ops.knn import mean_knn_sq_dist
    dist2 = np.asarray(mean_knn_sq_dist(jnp.asarray(points)))
    scales = np.zeros((cap, 3), np.float32)
    scales[:n] = np.log(np.sqrt(np.clip(dist2, 1e-7, None)))[:, None]

    rots = np.zeros((cap, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.full((cap, 1), float(inverse_sigmoid(jnp.asarray(0.1))), np.float32)
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = points
    alive = np.zeros(cap, bool)
    alive[:n] = True

    params = PointGaussianParams(
        xyz=jnp.asarray(xyz), features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(frest), scaling=jnp.asarray(scales),
        rotation=jnp.asarray(rots), opacity=jnp.asarray(opac))
    state = PointGaussianState(
        alive=jnp.asarray(alive), max_radii2d=jnp.zeros(cap, jnp.float32),
        grad_accum=jnp.zeros(cap, jnp.float32), denom=jnp.zeros(cap, jnp.float32))
    return params, state


# ------------------------------------------------------------ density control


class PointDensifyResult(NamedTuple):
    params: PointGaussianParams
    state: PointGaussianState
    touched: jnp.ndarray
    overflow: jnp.ndarray


def densify_clone(params: PointGaussianParams, state: PointGaussianState,
                  grads: jnp.ndarray, grad_threshold, percent_dense: float,
                  scene_extent) -> PointDensifyResult:
    """Clone small high-gradient Gaussians (gaussian_model.py:391-406)."""
    max_scale = jnp.max(get_scaling(params), axis=1)
    sel = ((grads >= grad_threshold)
           & (max_scale <= percent_dense * scene_extent) & state.alive)
    free = ~state.alive
    src, active = _rank_match_targets(sel, free)
    new_params = _copy_rows(params, src, active)
    new_state = state._replace(
        alive=state.alive | active,
        max_radii2d=jnp.where(active, 0.0, state.max_radii2d))
    overflow = jnp.maximum(jnp.sum(sel) - jnp.sum(free), 0)
    return PointDensifyResult(new_params, new_state, active, overflow)


def densify_split(params: PointGaussianParams, state: PointGaussianState,
                  grads: jnp.ndarray, grad_threshold, percent_dense: float,
                  scene_extent, rng_key: jax.Array) -> PointDensifyResult:
    """Split large high-gradient Gaussians into N=2 jittered children
    (gaussian_model.py:364-389): child xyz = parent + R @ (eps * scales),
    child scales = scales / (0.8 * N)."""
    n_split = 2
    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=1)
    sel = ((grads >= grad_threshold)
           & (max_scale > percent_dense * scene_extent) & state.alive)

    rots = quat_to_rotmat(params.rotation)
    eps = jax.random.normal(rng_key, (n_split,) + scaling.shape)
    child_xyz = jnp.stack([params.xyz + bmv3(rots, eps[i] * scaling)
                           for i in range(n_split)])
    new_scaling = jnp.log(scaling / (0.8 * n_split))

    mask3 = sel[:, None]
    p1 = params._replace(
        xyz=jnp.where(mask3, child_xyz[0], params.xyz),
        scaling=jnp.where(mask3, new_scaling, params.scaling))

    free = ~state.alive
    src, active = _rank_match_targets(sel, free)
    p2 = _copy_rows(p1, src, active, overrides={
        "xyz": child_xyz[1][src], "scaling": new_scaling[src]})
    new_state = state._replace(
        alive=state.alive | active,
        max_radii2d=jnp.where(active | sel, 0.0, state.max_radii2d))
    overflow = jnp.maximum(jnp.sum(sel) - jnp.sum(free), 0)
    return PointDensifyResult(p2, new_state, active | sel, overflow)


def prune(params: PointGaussianParams, state: PointGaussianState, min_opacity,
          scene_extent, max_screen_size: float | None) -> PointGaussianState:
    """gaussian_model.py:408-418 parity."""
    mask = get_opacity(params)[:, 0] < min_opacity
    if max_screen_size is not None:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = jnp.max(get_scaling(params), axis=1) > 0.1 * scene_extent
        mask = mask | big_vs | big_ws
    return state._replace(alive=state.alive & ~mask)


def reset_opacity(params: PointGaussianParams) -> PointGaussianParams:
    return params._replace(opacity=inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01)))


def add_densification_stats(state: PointGaussianState,
                            xy_grad_norm: jnp.ndarray, radii: jnp.ndarray,
                            visibility: jnp.ndarray) -> PointGaussianState:
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(visibility, xy_grad_norm, 0.0),
        denom=state.denom + visibility.astype(state.denom.dtype),
        max_radii2d=jnp.where(visibility,
                              jnp.maximum(state.max_radii2d, radii),
                              state.max_radii2d))


# ---------------------------------------------------------------- rendering


def render_points(params: PointGaussianParams, state: PointGaussianState,
                  cam_arrays, width: int, height: int, tanfovx: float,
                  tanfovy: float, bg_color, sh_degree: int,
                  k_cap: int = 256, k_chunk: int = 32):
    """Render the free-xyz model from one camera: SH -> colors ->
    project -> tile rasterize. Returns (rgb, depth, radii)."""
    from cloth_splatting_tpu.ops.projection import (
        build_covariance,
        project_gaussians,
    )
    from cloth_splatting_tpu.ops.rasterize.tiled import rasterize_tiled
    from cloth_splatting_tpu.ops.sh import eval_sh

    dirs = params.xyz - cam_arrays.camera_center[None]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    colors = jnp.maximum(eval_sh(sh_degree, get_features(params), dirs) + 0.5, 0.0)
    cov = build_covariance(get_scaling(params), params.rotation)
    proj = project_gaussians(params.xyz, cov, colors, get_opacity(params)[:, 0],
                             cam_arrays.world_view, cam_arrays.full_proj,
                             width, height, tanfovx, tanfovy,
                             alive=state.alive)
    rgb, depth, _, aux = rasterize_tiled(proj, width, height,
                                         jnp.asarray(bg_color),
                                         k_cap=k_cap, k_chunk=k_chunk)
    return rgb, depth, proj.radius


def fit_static_scene(cams, gts, point_cloud, width: int, height: int,
                     tanfovx: float, tanfovy: float,
                     sh_degree: int = 3, iterations: int = 300,
                     lr_xyz: float = 1.6e-4, lr_rest: float = 2.5e-3,
                     seed: int = 0, k_cap: int = 256,
                     white_background: bool = False):
    """Minimal free-xyz 3DGS fit over parallel lists of CameraArrays and
    gt images [3, H, W] — the legacy-scene training path (L1 + SSIM, single
    Adam with per-group LRs matching the reference's groups,
    gaussian_model.py:149-179; no density control: static legacy fits in
    this framework are an eval/compat surface, the cloth trainer is the
    flagship). Returns (params, state, final_loss)."""
    import optax

    from cloth_splatting_tpu.train.losses import image_losses

    rng = np.random.default_rng(seed)
    params, state = init_from_point_cloud(
        rng, point_cloud.points, point_cloud.colors, sh_degree)

    labels = PointGaussianParams(xyz="xyz", features_dc="features_dc",
                                 features_rest="features_rest",
                                 scaling="scaling", rotation="rotation",
                                 opacity="opacity")
    lrs = {"xyz": lr_xyz, "features_dc": lr_rest, "features_rest": lr_rest / 20,
           "scaling": 5e-3, "rotation": 1e-3, "opacity": 0.05}
    tx = optax.multi_transform(
        {k: optax.adam(v, eps=1e-15) for k, v in lrs.items()}, labels)
    opt_state = tx.init(params)

    bg = jnp.ones(3) if white_background else jnp.zeros(3)

    def loss_fn(p, cam, gt):
        rgb, _, _ = render_points(p, state, cam, width, height,
                                  tanfovx, tanfovy, bg, sh_degree, k_cap=k_cap)
        loss, _ = image_losses(rgb[None], gt[None], lambda_dssim=0.2)
        return loss

    @jax.jit
    def step(p, o, cam, gt):
        loss, grads = jax.value_and_grad(loss_fn)(p, cam, gt)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    loss = jnp.inf
    for it in range(iterations):
        i = it % len(cams)
        params, opt_state, loss = step(params, opt_state, cams[i], gts[i])
    return params, state, float(loss)
