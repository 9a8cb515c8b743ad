"""The jitted Gaussian-splat train step + host-side schedule driver.

The reference's train_step (scene_reconstruction/train_utils.py:240-321)
renders <=3 cameras sequentially, backprops, then mutates tensors in-place
for densification. Here the whole step is ONE compiled XLA program:

  * the camera batch is vmapped over the renderer (the 3 consecutive-time
    cameras are data-parallel until the loss reduction),
  * one value_and_grad over (gaussian params, simulator params, screenspace
    offsets) yields both Adam updates and the viewspace gradients density
    control needs,
  * Adam runs as ``optax.scale_by_adam`` with per-parameter-group learning
    rates applied as a pytree multiply (the Gaussian position group follows
    the log-linear schedule, reference gaussian_mesh.py:121-140),
  * densification statistics update in-step; the densify/prune/reset ops are
    separate jitted programs invoked on the host schedule (every ~100-200
    iters), operating at fixed capacity (models/gaussians.py).

The step is cached per (batch size, active SH degree, static flag, masks):
a handful of recompiles over a whole run.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.models.deform import ResidualSimulatorParams
from cloth_splatting_tpu.ops.image import psnr
from cloth_splatting_tpu.render import CameraArrays, RenderOutput, render
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.losses import (
    KnnState,
    image_losses,
    knn_regularization,
    regularization,
)
from cloth_splatting_tpu.train.schedules import expon_lr


class SplatTrainState(NamedTuple):
    params: G.GaussianParams
    gstate: G.GaussianState
    g_opt: Any
    sim_params: ResidualSimulatorParams
    sim_opt: Any
    step: jnp.ndarray       # scalar int32


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    psnr: jnp.ndarray
    l1: jnp.ndarray
    n_alive: jnp.ndarray
    n_dropped: jnp.ndarray


class StepCarry(NamedTuple):
    """Device-resident running statistics threaded through the banked step so
    per-iteration EMA smoothing and overflow accounting never cost a blocking
    device->host fetch (the loop only fetches at progress ticks; a k_cap
    overflow ANYWHERE in the window must still surface — train/loop.py)."""

    ema_loss: jnp.ndarray    # per-iteration 0.4/0.6 EMA (reference train.py:182)
    ema_psnr: jnp.ndarray
    drop_accum: jnp.ndarray  # sum of n_dropped since the last fetch tick

    @staticmethod
    def zeros() -> "StepCarry":
        return StepCarry(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                         jnp.zeros((), jnp.int32))


class Trainer:
    """Owns the compiled step programs for one scene."""

    def __init__(self, cfg: Config, mesh: G.Mesh, mesh_predictions: jnp.ndarray,
                 width: int, height: int, tanfovx: float, tanfovy: float,
                 spatial_lr_scale: float):
        self.cfg = cfg
        self.mesh = mesh
        self.mesh_predictions = mesh_predictions
        self.width, self.height = width, height
        self.tanfovx, self.tanfovy = tanfovx, tanfovy
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.g_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)
        self.sim_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        bg = [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
        self.bg_color = jnp.asarray(bg, jnp.float32)
        self.bg_static = tuple(bg)
        backend = getattr(cfg.opt, "raster_backend", "auto")
        if backend == "auto":
            backend = "pallas" if jax.default_backend() != "cpu" else "tiled"
        self.backend = backend

    # ------------------------------------------------------------------ init

    def init_state(self, rng: np.random.Generator,
                   params: G.GaussianParams | None = None,
                   gstate: G.GaussianState | None = None,
                   sim_params: ResidualSimulatorParams | None = None) -> SplatTrainState:
        from cloth_splatting_tpu.models.deform import (
            init_embedding_simulator,
            init_residual_simulator,
        )

        if params is None or gstate is None:
            params, gstate = G.init_from_mesh(
                rng, self.mesh, self.cfg.model.sh_degree,
                self.cfg.opt.gaussian_init_factor,
            )
        if sim_params is None:
            if getattr(self.cfg.model, "simulator", "mlp") == "embedding":
                sim_params = init_embedding_simulator(
                    rng, int(self.mesh_predictions.shape[0]),
                    int(self.mesh.pos.shape[0]))
            else:
                sim_params = init_residual_simulator(
                    rng, int(self.mesh.pos.shape[0]))
        return SplatTrainState(
            params=params,
            gstate=gstate,
            g_opt=self.g_tx.init(params),
            sim_params=sim_params,
            sim_opt=self.sim_tx.init(sim_params),
            step=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return -1  # resolved from state at call sites

    # ------------------------------------------------------------------ lr

    def _tail_mult(self, step):
        """Cosine tail-decay multiplier over ALL param groups (1.0 = off);
        see config.lr_tail_start for the rationale."""
        o = self.cfg.opt
        if o.lr_tail_start >= 1.0:
            return 1.0
        total = float(max(o.iterations, 1))
        t0 = o.lr_tail_start * total
        frac = jnp.clip((jnp.asarray(step, jnp.float32) - t0)
                        / max(total - t0, 1.0), 0.0, 1.0)
        return (o.lr_tail_floor + (1.0 - o.lr_tail_floor)
                * 0.5 * (1.0 + jnp.cos(jnp.pi * frac)))

    def _lr_tree(self, step) -> G.GaussianParams:
        o = self.cfg.opt
        pos_lr = expon_lr(
            step,
            o.position_lr_init * self.spatial_lr_scale,
            o.position_lr_final * self.spatial_lr_scale,
            lr_delay_mult=o.position_lr_delay_mult,
            max_steps=o.position_lr_max_steps,
        )
        mult = self._tail_mult(step)
        return G.GaussianParams(
            face_bary=pos_lr * mult,
            face_offset=pos_lr * mult,
            features_dc=o.feature_lr * mult,
            features_rest=o.feature_lr / 20.0 * mult,
            opacity=o.opacity_lr * mult,
            scaling=o.scaling_lr * mult,
            rotation=o.rotation_lr * mult,
        )

    # ------------------------------------------------------------------ step

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree", "static", "has_masks"))
    def _step_banked(self, state: SplatTrainState, cam_bank: CameraArrays,
                     gt_bank: jnp.ndarray, mask_bank: jnp.ndarray | None,
                     view_idx: jnp.ndarray, time_ids: jnp.ndarray,
                     sh_degree: int, static: bool, has_masks: bool,
                     knn_state=None, carry: StepCarry | None = None):
        """Step addressing an on-device (view x time) camera/image bank by
        index — the whole sampling+training iteration is one XLA program with
        zero host->device transfer."""
        cams = jax.tree_util.tree_map(lambda a: a[view_idx, time_ids], cam_bank)
        gts = gt_bank[view_idx, time_ids].astype(jnp.float32) / 255.0
        masks = mask_bank[view_idx, time_ids] if has_masks else None
        new_state, metrics = self._step_inner(state, cams, gts, masks,
                                              sh_degree, static, has_masks,
                                              knn_state)
        if carry is None:
            return new_state, metrics
        new_carry = StepCarry(
            ema_loss=0.4 * metrics.loss + 0.6 * carry.ema_loss,
            ema_psnr=0.4 * metrics.psnr + 0.6 * carry.ema_psnr,
            drop_accum=carry.drop_accum + metrics.n_dropped.astype(jnp.int32),
        )
        return new_state, metrics, new_carry

    def step_banked(self, state, cam_bank, gt_bank, mask_bank, view_idx, time_ids,
                    sh_degree: int, static: bool, knn_state=None, carry=None):
        return self._step_banked(state, cam_bank, gt_bank, mask_bank,
                                 jnp.asarray(view_idx, jnp.int32),
                                 jnp.asarray(time_ids, jnp.int32),
                                 sh_degree, static, mask_bank is not None,
                                 knn_state, carry)

    def grow_k_cap(self, factor: int = 2) -> int:
        """Double the dense tier's per-tile instance cap and drop the stale
        compiled steps (k_cap is baked into them through ``self``, which jit
        treats as a static argument — mutating cfg alone would keep serving
        the old executable). The CUDA tier has no cap at all (SURVEY.md
        section 2.1 row 1); growth restores that semantics under persistent
        overflow the same way grow_capacity handles densify overflow."""
        o = self.cfg.opt
        o.raster_k_cap = int(o.raster_k_cap * factor)
        Trainer._step_banked.clear_cache()
        Trainer._step.clear_cache()
        return o.raster_k_cap

    @functools.partial(jax.jit, static_argnames=("self", "sh_degree", "static", "has_masks"))
    def _step(self, state: SplatTrainState, cams: CameraArrays,
              gt_images: jnp.ndarray, masks: jnp.ndarray | None,
              sh_degree: int, static: bool, has_masks: bool, knn_state=None):
        return self._step_inner(state, cams, gt_images, masks, sh_degree,
                                static, has_masks, knn_state)

    def _step_inner(self, state: SplatTrainState, cams: CameraArrays,
                    gt_images: jnp.ndarray, masks: jnp.ndarray | None,
                    sh_degree: int, static: bool, has_masks: bool,
                    knn_state=None, mesh: G.Mesh | None = None,
                    mesh_predictions: jnp.ndarray | None = None):
        """``mesh``/``mesh_predictions`` override the trainer's own scene
        (same static shapes required) — the scene-parallel sweep passes each
        device its own scene's arrays through one shared program
        (parallel/sweep.py)."""
        o = self.cfg.opt
        mesh = self.mesh if mesh is None else mesh
        mesh_predictions = (self.mesh_predictions if mesh_predictions is None
                            else mesh_predictions)
        cap = state.params.face_bary.shape[0]

        def loss_fn(params, sim_params, screen_offset):
            def render_one(cam):
                return render(
                    cam, self.width, self.height, self.tanfovx, self.tanfovy,
                    params, state.gstate, mesh, sim_params,
                    mesh_predictions, self.bg_color, sh_degree,
                    screen_offset=screen_offset, render_static=static,
                    k_cap=o.raster_k_cap, k_chunk=o.raster_k_chunk,
                    backend=self.backend, bg_static=self.bg_static,
                    pack_order=getattr(o, "raster_pack_order", "fused"),
                )

            if self.backend == "pallas":
                # pallas_call doesn't batch under vmap; the cameras run
                # sequentially inside one program (same total kernel work)
                outs: RenderOutput = jax.lax.map(render_one, cams)
            else:
                outs: RenderOutput = jax.vmap(render_one)(cams)
            images = outs.rgb                                   # [B, 3, H, W]
            loss, ldict = image_losses(images, gt_images, o.lambda_dssim,
                                       masks if has_masks else None)
            anchor_base = None
            if getattr(o, "lambda_anchor", 0.0) > 0.0 and not static:
                n_times = mesh_predictions.shape[0]
                dt = 1.0 if n_times == 1 else 1.0 / (n_times - 1)
                tid = jnp.clip(jnp.round(cams.time / dt).astype(jnp.int32),
                               0, n_times - 1)              # [B]
                anchor_base = mesh_predictions[tid]         # [B, V, 3]
            loss = loss + regularization(
                outs.vertices, mesh, o.lambda_deform_mag, o.lambda_rigid,
                o.lambda_momentum, static,
                lambda_anchor=getattr(o, "lambda_anchor", 0.0),
                anchor_base=anchor_base,
            )
            if knn_state is not None and not static:
                loss = loss + knn_regularization(
                    outs.means3d, outs.rotations, knn_state,
                    o.lambda_isometric, o.lambda_spring, o.lambda_rigidity,
                )
            aux = {
                "psnr": jnp.mean(psnr(images, gt_images)),
                "l1": ldict["l1"],
                "radii": jnp.max(outs.radii, axis=0),           # [C]
                "visibility": jnp.any(outs.visibility, axis=0),  # [C]
                "n_dropped": jnp.sum(outs.n_dropped),
            }
            return loss, aux

        screen_offset = jnp.zeros((cap, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.sim_params, screen_offset
        )
        g_grads, sim_grads, screen_grad = grads

        # Density-control statistics (viewspace gradient norms summed over cams).
        xy_grad_norm = jnp.linalg.norm(screen_grad, axis=-1)
        gstate = G.add_densification_stats(state.gstate, xy_grad_norm,
                                           aux["radii"], aux["visibility"])

        # Gaussian Adam step with per-group LRs.
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.params)
        lr_tree = self._lr_tree(state.step)
        new_params = jax.tree_util.tree_map(
            lambda p, u, lr: p - lr * u, state.params, g_updates, lr_tree
        )

        # Simulator Adam step (frozen during the static stage).
        sim_updates, sim_opt = self.sim_tx.update(sim_grads, state.sim_opt, state.sim_params)
        if static:
            new_sim = state.sim_params
            sim_opt = state.sim_opt
        else:
            sim_lr = self.cfg.meshnet.lr_init * self._tail_mult(state.step)
            new_sim = jax.tree_util.tree_map(
                lambda p, u: p - sim_lr * u,
                state.sim_params, sim_updates,
            )

        new_state = SplatTrainState(new_params, gstate, g_opt, new_sim, sim_opt,
                                    state.step + 1)
        metrics = StepMetrics(loss=loss, psnr=aux["psnr"], l1=aux["l1"],
                              n_alive=G.num_alive(gstate), n_dropped=aux["n_dropped"])
        return new_state, metrics

    def step(self, state: SplatTrainState, cams: CameraArrays,
             gt_images: jnp.ndarray, masks: jnp.ndarray | None,
             sh_degree: int, static: bool, knn_state=None):
        return self._step(state, cams, gt_images, masks, sh_degree, static,
                          masks is not None, knn_state)

    # ------------------------------------------------------------------ knn

    @functools.partial(jax.jit, static_argnames=("self",))
    def _knn_state(self, state: SplatTrainState):
        from cloth_splatting_tpu.models.deform import simulate_any
        from cloth_splatting_tpu.ops.knn import knn as knn_fn

        o = self.cfg.opt
        verts0 = simulate_any(state.sim_params, self.mesh_predictions,
                              jnp.zeros((), jnp.float32))
        means = G.gaussian_positions(state.params, state.gstate, self.mesh,
                                     verts0)
        alive = state.gstate.alive
        cap = means.shape[0]
        # park dead capacity slots far away, each at a distinct spot, so they
        # are never neighbors of live gaussians (nor of each other's queries)
        park = (~alive).astype(jnp.float32) * (
            1e6 + jnp.arange(cap, dtype=jnp.float32) * 1e3)
        pts = means.at[:, 0].add(park)
        d2, idx = knn_fn(pts, k=o.k_nearest)
        finite = jnp.isfinite(d2)
        d2 = jnp.where(finite, d2, 0.0)
        valid = alive[:, None] & alive[idx] & finite
        d0 = jnp.sqrt(d2)
        w = jnp.where(valid, jnp.exp(-o.lambda_w * d2), 0.0)
        return KnnState(idx=idx.astype(jnp.int32), d0=d0, w=w, valid=valid)

    def compute_knn_state(self, state: SplatTrainState) -> KnnState:
        """kNN neighborhoods at the t=0 deformed state (reference
        train_utils.py:113-119: o3d_knn over get_pos_t0, weights
        exp(-lambda_w * d^2), refreshed every knn_update_iter)."""
        return self._knn_state(state)

    # ------------------------------------------------------ density control

    @functools.partial(jax.jit, static_argnames=("self",))
    def _densify(self, state: SplatTrainState, grad_threshold, rng_key):
        o = self.cfg.opt
        grads = state.gstate.grad_accum / jnp.maximum(state.gstate.denom, 1e-12)
        grads = jnp.where(jnp.isnan(grads), 0.0, grads)

        res_c = G.densify_clone(state.params, state.gstate, grads, grad_threshold,
                                o.percent_dense, self.spatial_lr_scale)
        res_s = G.densify_split(res_c.params, res_c.state, self.mesh, grads,
                                grad_threshold, o.percent_dense,
                                self.spatial_lr_scale, rng_key)
        touched = res_c.touched | res_s.touched
        cap = state.params.face_bary.shape[0]
        g_opt = G.zero_opt_rows(state.g_opt, touched, cap)
        # Reference resets all densification stats after a densify round
        # (densification_postfix, gaussian_model.py:360-362).
        gstate = res_s.state._replace(
            grad_accum=jnp.zeros_like(res_s.state.grad_accum),
            denom=jnp.zeros_like(res_s.state.denom),
            max_radii2d=jnp.zeros_like(res_s.state.max_radii2d),
        )
        overflow = res_c.overflow + res_s.overflow
        return state._replace(params=res_s.params, gstate=gstate, g_opt=g_opt), overflow

    @functools.partial(jax.jit, static_argnames=("self", "use_size_threshold"))
    def _prune(self, state: SplatTrainState, min_opacity, use_size_threshold: bool):
        gstate = G.prune(state.params, state.gstate, min_opacity,
                         self.spatial_lr_scale,
                         20.0 if use_size_threshold else None)
        return state._replace(gstate=gstate)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _reset_opacity(self, state: SplatTrainState):
        params, touched = G.reset_opacity(state.params)
        cap = params.opacity.shape[0]
        # Only the opacity leaf's moments need clearing; zero_opt_rows masks by
        # row, so scope it via a tree that only touches opacity-shaped leaves.
        g_opt = jax.tree_util.tree_map(
            lambda leaf: (
                jnp.zeros_like(leaf)
                if isinstance(leaf, jnp.ndarray) and leaf.shape == params.opacity.shape
                else leaf
            ),
            state.g_opt,
        )
        return state._replace(params=params, g_opt=g_opt)

    # ------------------------------------------------------------- schedule

    @staticmethod
    def density_control_due(cfg: Config, iteration: int) -> bool:
        """True iff density_control would act this iteration (lets callers
        that hold scene-stacked state skip the unstack when idle)."""
        o = cfg.opt
        if iteration >= o.densify_until_iter:
            return False
        return (
            (iteration > o.densify_from_iter
             and iteration % o.densification_interval == 0)
            or (iteration > o.pruning_from_iter
                and iteration % o.pruning_interval == 0)
            or iteration % o.opacity_reset_interval == 0
            or (cfg.model.white_background
                and iteration == o.densify_from_iter)
        )

    def density_control(self, state: SplatTrainState, iteration: int,
                        rng_key) -> tuple[SplatTrainState, int]:
        """Host-side schedule mirroring train_utils.py:294-345. Returns
        (state, overflow count)."""
        o = self.cfg.opt
        overflow = 0
        if iteration >= o.densify_until_iter:
            return state, overflow

        opacity_threshold = o.opacity_threshold_fine_init - iteration * (
            o.opacity_threshold_fine_init - o.opacity_threshold_fine_after
        ) / o.densify_until_iter
        densify_threshold = o.densify_grad_threshold_fine_init - iteration * (
            o.densify_grad_threshold_fine_init - o.densify_grad_threshold_after
        ) / o.densify_until_iter

        if iteration > o.densify_from_iter and iteration % o.densification_interval == 0:
            state, ovf = self._densify(state, densify_threshold, rng_key)
            overflow = int(ovf)
            if overflow > 0:
                state = self.grow_capacity(state)
        if iteration > o.pruning_from_iter and iteration % o.pruning_interval == 0:
            state = self._prune(state, opacity_threshold,
                                iteration > o.opacity_reset_interval)
        if iteration % o.opacity_reset_interval == 0 or (
            self.cfg.model.white_background and iteration == o.densify_from_iter
        ):
            state = self._reset_opacity(state)
        return state, overflow

    def grow_capacity(self, state: SplatTrainState,
                      factor: float = 2.0) -> SplatTrainState:
        """Host-side capacity growth after a densify overflow: pad every
        capacity-leading array (params, bookkeeping, Adam moments) with dead
        slots. Costs one recompile per growth — amortized, since growth
        happens at most log2(final/initial) times per run."""
        old_cap = state.params.face_bary.shape[0]
        new_cap = G.round_capacity(int(old_cap * factor))
        if new_cap <= old_cap:
            return state
        print(f"[density] growing gaussian capacity {old_cap} -> {new_cap}")
        params, gstate, g_opt = G.grow_state_arrays(
            state.params, state.gstate, state.g_opt, new_cap)
        return state._replace(params=params, gstate=gstate, g_opt=g_opt)

    # --------------------------------------------------- barycentric cleanup

    def cleanup_barycentric(self, state: SplatTrainState) -> SplatTrainState:
        """Reassign Gaussians with negative barycentric coords to the adjacent
        face (host-side, infrequent; parity: gaussian_mesh.py:266-322)."""
        params, gstate = cleanup_barycentric_host(state.params, state.gstate, self.mesh)
        return state._replace(params=params, gstate=gstate)


def cleanup_barycentric_host(params: G.GaussianParams, gstate: G.GaussianState,
                             mesh: G.Mesh) -> tuple[G.GaussianParams, G.GaussianState]:
    """Numpy implementation of the barycentric cleanup.

    For each alive Gaussian with a negative barycentric coordinate, move it to
    the neighboring face sharing the edge opposite the offending vertex; if no
    neighbor exists (mesh boundary), nudge the coordinate back inside.
    """
    bary = np.asarray(params.face_bary).copy()
    face_ids = np.asarray(gstate.face_ids).copy()
    alive = np.asarray(gstate.alive)
    faces = np.asarray(mesh.faces)
    pos = np.asarray(mesh.pos)

    # edge (min(v1,v2), max(v1,v2)) -> faces containing it
    from collections import defaultdict

    edge2faces = defaultdict(list)
    for f_idx, f in enumerate(faces):
        for k in range(3):
            e = (min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))
            edge2faces[e].append(f_idx)

    xyz = np.einsum(
        "cb,cbx->cx",
        bary / np.maximum(bary.sum(1, keepdims=True), 1e-8),
        pos[faces[face_ids]],
    )

    affected = np.argwhere((bary < 0) & alive[:, None])
    for gi, bi in affected:
        f = faces[face_ids[gi]]
        others = np.delete(f, bi)
        e = (min(others[0], others[1]), max(others[0], others[1]))
        candidates = [c for c in edge2faces[e] if c != face_ids[gi]]
        if not candidates:
            bary[gi, bi] = 0.005
            bary[gi] = bary[gi] / bary[gi].sum()
        else:
            new_face = candidates[0]
            face_ids[gi] = new_face
            tri = pos[faces[new_face]]
            d = np.linalg.norm(xyz[gi][None] - tri, axis=1)
            bary[gi] = d / d.sum()

    return (
        params._replace(face_bary=jnp.asarray(bary)),
        gstate._replace(face_ids=jnp.asarray(face_ids)),
    )
