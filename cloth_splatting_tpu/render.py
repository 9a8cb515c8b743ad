"""Top-level differentiable render function (the reference's
``gaussian_renderer.render`` equivalent, gaussian_renderer/__init__.py:39-206).

Pipeline per camera: residual simulator -> deformed vertices -> barycentric
Gaussian means + Kabsch face rotations -> SH colors -> EWA projection ->
tile-binned rasterization. Everything stays inside one jit/grad scope so XLA
fuses the whole chain; ``screen_offset`` is a zeros input whose gradient
reproduces the CUDA pipeline's retained viewspace (NDC-scaled) mean2D
gradient used by adaptive density control (train_utils.py:290-292).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cloth_splatting_tpu.models.deform import (
    ResidualSimulatorParams,
    simulate_any,
)
from cloth_splatting_tpu.models.gaussians import (
    GaussianParams,
    GaussianState,
    Mesh,
    gaussian_positions,
    gaussian_rotations,
    get_features,
    get_opacity,
    get_scaling,
)
from cloth_splatting_tpu.ops.projection import build_covariance, project_gaussians
from cloth_splatting_tpu.ops.quaternion import quat_normalize
from cloth_splatting_tpu.ops.rasterize.tiled import rasterize_tiled
from cloth_splatting_tpu.ops.sh import eval_sh


class CameraArrays(NamedTuple):
    """Device-side camera tensors (static dims travel as Python ints)."""

    world_view: jnp.ndarray    # [4, 4] row-vector W2C
    full_proj: jnp.ndarray     # [4, 4]
    camera_center: jnp.ndarray  # [3]
    time: jnp.ndarray          # scalar


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray             # [3, H, W]
    depth: jnp.ndarray           # [1, H, W]
    alpha: jnp.ndarray           # [1, H, W]
    radii: jnp.ndarray           # [C]
    visibility: jnp.ndarray      # [C] bool (radius > 0)
    means3d: jnp.ndarray         # [C, 3] deformed Gaussian centers
    vertices: jnp.ndarray        # [V, 3] deformed mesh vertices
    rotations: jnp.ndarray       # [C, 4]
    projections: jnp.ndarray     # [C, 2] pixel-space projections (tracking)
    n_dropped: jnp.ndarray       # binning overflow diagnostic


def camera_arrays(cam) -> CameraArrays:
    return CameraArrays(
        world_view=jnp.asarray(cam.world_view),
        full_proj=jnp.asarray(cam.full_proj),
        camera_center=jnp.asarray(cam.camera_center),
        time=jnp.asarray(cam.time, dtype=jnp.float32),
    )


def render(
    cam: CameraArrays,
    width: int,
    height: int,
    tanfovx: float,
    tanfovy: float,
    params: GaussianParams,
    state: GaussianState,
    mesh: Mesh,
    sim_params: ResidualSimulatorParams | None,
    mesh_predictions: jnp.ndarray | None,
    bg_color: jnp.ndarray,
    sh_degree: int,
    screen_offset: jnp.ndarray | None = None,
    render_static: bool = False,
    scaling_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
    override_vertices: jnp.ndarray | None = None,
    k_cap: int = 512,
    k_chunk: int = 32,
    backend: str = "tiled",
    bg_static: tuple[float, float, float] | None = None,
    gather_axis: str | None = None,
    pack_order: str = "fused",
) -> RenderOutput:
    """Render one camera. ``sh_degree`` is the ACTIVE degree (static int).

    ``override_vertices`` renders the Gaussians at explicitly given deformed
    vertices (bypassing the simulator) — used by dataset synthesis and eval.

    ``gather_axis`` supports running under ``shard_map`` with the Gaussian
    capacity sharded over a mesh axis: all per-Gaussian work (barycentric
    gather, SH, EWA projection) runs on the LOCAL capacity shard, then the
    projected screen-space bundle is ``lax.all_gather``-ed over that axis so
    the tile compositor sees every Gaussian. On the backward pass the
    gather transposes to a reduce-scatter, landing each shard's gradients
    back on its owner device. The per-Gaussian output fields (radii,
    visibility, means3d, rotations, projections) stay LOCAL-shard sized.
    """
    if override_vertices is not None:
        vertices = override_vertices
        means3d = gaussian_positions(params, state, mesh, vertices)
        rotations = gaussian_rotations(params, state, mesh, vertices)
    elif render_static or sim_params is None:
        vertices = mesh.pos
        means3d = gaussian_positions(params, state, mesh)
        rotations = quat_normalize(params.rotation)
    else:
        vertices = simulate_any(sim_params, mesh_predictions, cam.time)
        means3d = gaussian_positions(params, state, mesh, vertices)
        rotations = gaussian_rotations(params, state, mesh, vertices)

    scales = get_scaling(params)
    opacity = get_opacity(params)
    cov3d = build_covariance(scales, rotations, scaling_modifier)

    if override_color is None:
        dirs = means3d - cam.camera_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        sh = get_features(params)                       # [C, K, 3]
        colors = jnp.maximum(eval_sh(sh_degree, sh, dirs) + 0.5, 0.0)
    else:
        colors = override_color

    proj = project_gaussians(
        means3d, cov3d, colors, opacity,
        cam.world_view, cam.full_proj,
        width, height, tanfovx, tanfovy,
        alive=state.alive,
    )
    if screen_offset is not None:
        # NDC-scaled handle: grad wrt screen_offset equals the CUDA kernel's
        # dL/dmean2D (pixel-grad * [W/2, H/2]).
        scale = jnp.asarray([width / 2.0, height / 2.0], dtype=proj.xy.dtype)
        proj = proj._replace(xy=proj.xy + screen_offset * scale)

    proj_full = proj
    if gather_axis is not None:
        import jax

        proj_full = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, gather_axis, tiled=True), proj)

    if backend == "pallas_fwd":
        # Forward-only serving Pallas tier: no k_cap, exact depth ordering,
        # no VJP bookkeeping — the fastest path for eval/video rendering.
        import jax

        from cloth_splatting_tpu.ops.rasterize.pallas_tiled import (
            rasterize_pallas,
        )

        if bg_static is None:
            raise ValueError("backend='pallas_fwd' requires bg_static")
        rgb, depth, alpha, _ = rasterize_pallas(
            proj_full, width, height, bg_static,
            interpret=jax.default_backend() == "cpu",
            pack_order=pack_order,
        )
        n_dropped = jnp.zeros((), jnp.int32)
    elif backend == "pallas":
        # Differentiable Pallas tier (custom VJP): no k_cap, exact depth
        # ordering. Background must be static (baked into the kernel).
        import jax

        from cloth_splatting_tpu.ops.rasterize.pallas_train import (
            rasterize_pallas_grad,
        )

        if bg_static is None:
            raise ValueError("backend='pallas' requires bg_static")
        rgb, depth, alpha = rasterize_pallas_grad(
            proj_full, width, height, bg_static,
            interpret=jax.default_backend() == "cpu",
            pack_order=pack_order,
        )
        n_dropped = jnp.zeros((), jnp.int32)
    else:
        rgb, depth, alpha, aux = rasterize_tiled(
            proj_full, width, height, bg_color, k_cap=k_cap,
            k_chunk=min(k_chunk, k_cap),
        )
        n_dropped = aux.n_dropped

    return RenderOutput(
        rgb=rgb,
        depth=depth,
        alpha=alpha,
        radii=proj.radius,
        visibility=proj.radius > 0,
        means3d=means3d,
        vertices=vertices,
        rotations=rotations,
        projections=proj.xy,
        n_dropped=n_dropped,
    )
