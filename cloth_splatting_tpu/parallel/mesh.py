"""Device-mesh parallelism for splat training and GNN training.

The reference is strictly single-GPU (SURVEY.md section 2.3: no DP/TP/PP/SP
or distributed backend anywhere); this layer is NEW capability designed
TPU-first: a 2-axis ``jax.sharding.Mesh``

  * ``data``  — camera-batch data parallelism (the 3 consecutive-time
    cameras of a step are embarrassingly parallel until the loss reduce),
  * ``model`` — Gaussian-capacity sharding: per-Gaussian work (SH eval,
    covariance, EWA projection, barycentric gathers, Adam state) is sharded
    along the capacity axis; XLA inserts the all-gather feeding the
    per-camera tile compositor and the reduce-scatter on the backward pass.

Following the standard JAX recipe, we ANNOTATE shardings on the jit and let
GSPMD place the collectives on ICI — no hand-written NCCL-style transport.
Single-chip is the degenerate 1x1 mesh: the unsharded paths never pay for
this module.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None) -> Mesh:
    """A (data, model) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = 1
        for cand in (3, 2):
            if n % cand == 0:
                data = cand
                break
    model = n // data
    dev_grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_grid, axis_names=("data", "model"))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Per-Gaussian arrays: shard the capacity (leading) axis over 'model'."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cam_sharding(mesh: Mesh) -> NamedSharding:
    """Camera-batch arrays: shard the batch (leading) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_splat_state(state: Any, mesh: Mesh) -> Any:
    """Place a SplatTrainState on the mesh: all capacity-leading arrays
    sharded over 'model', everything else replicated."""
    cap = state.params.face_bary.shape[0]
    gs = gauss_sharding(mesh)
    rep = replicated(mesh)

    def place(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return jax.device_put(leaf, gs)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map(place, state)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over 'data'."""
    cs = cam_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), cs), tree)


def make_sharded_splat_step(trainer, mesh: Mesh, sh_degree: int, static: bool):
    """A jitted splat train step with explicit sharding annotations.

    The camera batch is sharded over 'data'; the Gaussian state over 'model'
    (via the layout established by shard_splat_state — jit infers from input
    shardings and GSPMD propagates)."""

    def step(state, cams, gt_images):
        return trainer._step_inner(state, cams, gt_images, None, sh_degree,
                                   static, False)

    return jax.jit(step, static_argnums=())


def splat_state_specs(state) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec tree for a SplatTrainState: capacity-leading leaves on
    'model', everything else replicated (the shard_splat_state layout)."""
    cap = state.params.face_bary.shape[0]

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return P("model")
        return P()

    return jax.tree_util.tree_map(spec, state)


def make_pallas_sharded_splat_step(trainer, mesh: Mesh, sh_degree: int,
                                   static: bool, state_template):
    """The sharded train step over the PALLAS rasterizer tiers.

    ``pallas_call`` cannot be auto-partitioned by GSPMD, so this step is an
    explicit ``shard_map`` over the (data, model) mesh with the collective
    structure spelled out:

      * per-Gaussian work (barycentric gather, SH eval, covariance, EWA
        projection, Adam moments) runs on each device's LOCAL capacity
        shard;
      * the projected screen-space bundle is all-gathered over 'model'
        (render.py ``gather_axis``) so each device's Pallas compositor sees
        every Gaussian for its LOCAL camera shard;
      * autodiff transposes that gather into a reduce-scatter, landing
        per-shard Gaussian gradients on their owners; camera-batch gradients
        are ``psum``-ed over 'data' (pure DP);
      * the replicated simulator params see a 'data'-psum only (every model
        column computes an identical contribution from identical cameras).

    Numerics match the unsharded pallas step (tests/test_parallel.py).
    kNN regularizers are not supported on this path (their neighborhoods are
    capacity-global); use the GSPMD tiled step for kNN-regularized configs.
    """
    from cloth_splatting_tpu.models import gaussians as G
    from cloth_splatting_tpu.ops.image import psnr
    from cloth_splatting_tpu.render import RenderOutput, render
    from cloth_splatting_tpu.train.losses import image_losses, regularization
    from cloth_splatting_tpu.train.step import SplatTrainState, StepMetrics

    o = trainer.cfg.opt
    d_rows, m_cols = mesh.devices.shape
    # Every device scales its local loss by 1/(D*M): the M model columns of
    # a data row render identical cameras against the same gathered bundle,
    # so the all-gather's transpose (psum-scatter over 'model') sums M
    # copies of each Gaussian-shard cotangent — the 1/M makes that sum the
    # true gradient; the 1/D makes the 'data' psum the camera mean.
    scale = float(d_rows * m_cols)

    def local_step(state, cams, gt_images):
        cap = state.params.face_bary.shape[0]       # LOCAL capacity shard

        def loss_fn(params, sim_params, screen_offset):
            def render_one(cam):
                return render(
                    cam, trainer.width, trainer.height, trainer.tanfovx,
                    trainer.tanfovy, params, state.gstate, trainer.mesh,
                    sim_params, trainer.mesh_predictions, trainer.bg_color,
                    sh_degree, screen_offset=screen_offset,
                    render_static=static, k_cap=o.raster_k_cap,
                    k_chunk=o.raster_k_chunk, backend="pallas",
                    bg_static=trainer.bg_static, gather_axis="model",
                )

            outs: RenderOutput = jax.lax.map(render_one, cams)
            images = outs.rgb
            img_loss, ldict = image_losses(images, gt_images,
                                           o.lambda_dssim, None)
            # the consecutive-frame regularizers pair vertices ACROSS the
            # camera batch, so they need the full [B, V, 3] stack: gather
            # over 'data' (tiny — V*3 floats/cam), compute the global term
            # identically on every device
            verts_full = jax.lax.all_gather(outs.vertices, "data",
                                            tiled=True)
            reg = regularization(verts_full, trainer.mesh,
                                 o.lambda_deform_mag, o.lambda_rigid,
                                 o.lambda_momentum, static)
            local = (img_loss + reg) / scale
            aux = {
                "psnr": jnp.mean(psnr(images, gt_images)) / scale,
                "l1": ldict["l1"] / scale,
                "radii": jnp.max(outs.radii, axis=0),            # [C_local]
                "visibility": jnp.any(outs.visibility, axis=0),
                "n_dropped": jnp.sum(outs.n_dropped),
            }
            return local, aux

        screen_offset = jnp.zeros((cap, 2), jnp.float32)
        (local_loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, state.sim_params, screen_offset)
        g_grads, sim_grads, screen_grad = grads

        # Gaussian-shard grads: the model-axis sum already happened inside
        # the gather transpose; only the camera rows remain
        g_grads = jax.lax.psum(g_grads, "data")
        screen_grad = jax.lax.psum(screen_grad, "data")
        # replicated quantities: every device holds a 1/(D*M) share
        loss = jax.lax.psum(local_loss, ("data", "model"))
        sim_grads = jax.lax.psum(sim_grads, ("data", "model"))
        psnr_v = jax.lax.psum(aux["psnr"], ("data", "model"))
        l1 = jax.lax.psum(aux["l1"], ("data", "model"))
        radii = jax.lax.pmax(aux["radii"], "data")
        visibility = jax.lax.pmax(aux["visibility"].astype(jnp.int32),
                                  "data") > 0
        # data-axis only: every model column rasterizes the same full
        # Gaussian set for its camera rows (gather_axis='model'), so
        # a model-axis psum would multiply the true count by m_cols
        n_dropped = jax.lax.psum(aux["n_dropped"], "data")

        xy_grad_norm = jnp.linalg.norm(screen_grad, axis=-1)
        gstate = G.add_densification_stats(state.gstate, xy_grad_norm,
                                           radii, visibility)

        g_updates, g_opt = trainer.g_tx.update(g_grads, state.g_opt,
                                               state.params)
        lr_tree = trainer._lr_tree(state.step)
        new_params = jax.tree_util.tree_map(
            lambda p, u, lr: p - lr * u, state.params, g_updates, lr_tree)

        sim_updates, sim_opt = trainer.sim_tx.update(sim_grads,
                                                     state.sim_opt,
                                                     state.sim_params)
        if static:
            new_sim = state.sim_params
            sim_opt = state.sim_opt
        else:
            new_sim = jax.tree_util.tree_map(
                lambda p, u: p - trainer.cfg.meshnet.lr_init * u,
                state.sim_params, sim_updates)

        new_state = SplatTrainState(new_params, gstate, g_opt, new_sim,
                                    sim_opt, state.step + 1)
        n_alive = jax.lax.psum(G.num_alive(gstate), "model")
        metrics = StepMetrics(loss=loss, psnr=psnr_v, l1=l1,
                              n_alive=n_alive, n_dropped=n_dropped)
        return new_state, metrics

    specs = splat_state_specs(state_template)
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(specs, P("data"), P("data")),
        out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_banked_sharded_step(trainer, mesh: Mesh, sh_degree: int,
                             static: bool, state_template, n_cams: int,
                             has_masks: bool, use_knn: bool):
    """The FULL-FEATURE sharded banked train step — the one `train_scene
    --device_mesh` runs every iteration.

    Same collective skeleton as ``make_pallas_sharded_splat_step`` (explicit
    shard_map, model-axis all-gather of the projection bundle whose autodiff
    transpose is the gradient reduce-scatter, data-axis psum), plus
    everything a real training run needs:

      * **bank addressing inside jit**: cameras/GT/masks live in replicated
        on-device (view x time) banks; each step slices its batch by
        (view_idx, time_ids) with zero host->device transfer;
      * **camera-batch padding**: the batch is padded to a multiple of the
        data-axis size by REPEATING cameras, and the padded frames are cut
        after the image all-gather — the pad camera's image gets a zero
        cotangent, so gradients are exactly the unpadded batch's (static
        stage B=1 and 3-step batches work on any mesh shape);
      * **exact batch loss**: rendered frames are all-gathered over 'data'
        (a few MB — rasterization dominates, the loss doesn't) and the loss
        is computed on the full batch with the UNSHARDED code path
        (image_losses incl. masks, regularization, knn_regularization), so
        sharded == unsharded numerics hold with masks and kNN active;
      * **kNN regularizers** (VERDICT r2 item 4): deformed means/rotations
        are all-gathered over 'data' then 'model' (16 B + 16 B per Gaussian
        — the positions are tiny next to the image tensors) and the
        capacity-global kNN terms run replicated against a replicated
        KnnState;
      * **device-resident EMA carry** (train/step.py StepCarry), threaded in
        the jit wrapper outside the shard_map.

    Returns step(state, cam_bank, gt_bank, mask_bank, view_idx, time_ids,
    knn_state, carry) -> (state, metrics, carry).
    """
    from cloth_splatting_tpu.models import gaussians as G
    from cloth_splatting_tpu.ops.image import psnr
    from cloth_splatting_tpu.render import RenderOutput, render
    from cloth_splatting_tpu.train.losses import (
        image_losses,
        knn_regularization,
        regularization,
    )
    from cloth_splatting_tpu.train.step import (
        SplatTrainState,
        StepCarry,
        StepMetrics,
    )

    o = trainer.cfg.opt
    d_rows, m_cols = mesh.devices.shape
    scale = float(d_rows * m_cols)
    pad = (-n_cams) % d_rows
    c_local = (n_cams + pad) // d_rows

    def local_step(state, cams, gts, masks, knn_state):
        # cams: LOCAL [(n_cams+pad)/D, ...] rows; gts/masks/knn: replicated
        cap = state.params.face_bary.shape[0]       # LOCAL capacity shard

        def loss_fn(params, sim_params, screen_offset):
            def render_one(cam):
                return render(
                    cam, trainer.width, trainer.height, trainer.tanfovx,
                    trainer.tanfovy, params, state.gstate, trainer.mesh,
                    sim_params, trainer.mesh_predictions, trainer.bg_color,
                    sh_degree, screen_offset=screen_offset,
                    render_static=static, k_cap=o.raster_k_cap,
                    k_chunk=min(o.raster_k_chunk, o.raster_k_cap),
                    backend=trainer.backend, bg_static=trainer.bg_static,
                    gather_axis="model",
                )

            outs: RenderOutput = jax.lax.map(render_one, cams)
            # full-batch stacks: gather the camera rows, cut the padding
            images = jax.lax.all_gather(outs.rgb, "data", tiled=True)[:n_cams]
            verts = jax.lax.all_gather(outs.vertices, "data",
                                       tiled=True)[:n_cams]
            img_loss, ldict = image_losses(images, gts, o.lambda_dssim,
                                           masks if has_masks else None)
            loss = img_loss + regularization(
                verts, trainer.mesh, o.lambda_deform_mag, o.lambda_rigid,
                o.lambda_momentum, static)
            if use_knn:
                means = jax.lax.all_gather(outs.means3d, "data",
                                           tiled=True)[:n_cams]
                means = jax.lax.all_gather(means, "model", axis=1, tiled=True)
                rots = jax.lax.all_gather(outs.rotations, "data",
                                          tiled=True)[:n_cams]
                rots = jax.lax.all_gather(rots, "model", axis=1, tiled=True)
                loss = loss + knn_regularization(
                    means, rots, knn_state, o.lambda_isometric,
                    o.lambda_spring, o.lambda_rigidity)
            # every device computes a 1/(D*M) share of the (replicated) batch
            # loss; see make_pallas_sharded_splat_step for why this scale
            # makes both psums and the gather transposes exact
            local = loss / scale
            aux = {
                "psnr": jnp.mean(psnr(images, gts)) / scale,
                "l1": ldict["l1"] / scale,
                "radii": jnp.max(outs.radii, axis=0),            # [C_local]
                "visibility": jnp.any(outs.visibility, axis=0),
                "n_dropped": jnp.sum(
                    outs.n_dropped
                    * (jax.lax.axis_index("data") * c_local
                       + jnp.arange(c_local)
                       < n_cams).astype(outs.n_dropped.dtype)),
            }
            return local, aux

        screen_offset = jnp.zeros((cap, 2), jnp.float32)
        (local_loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, state.sim_params, screen_offset)
        g_grads, sim_grads, screen_grad = grads

        g_grads = jax.lax.psum(g_grads, "data")
        screen_grad = jax.lax.psum(screen_grad, "data")
        loss = jax.lax.psum(local_loss, ("data", "model"))
        sim_grads = jax.lax.psum(sim_grads, ("data", "model"))
        psnr_v = jax.lax.psum(aux["psnr"], ("data", "model"))
        l1 = jax.lax.psum(aux["l1"], ("data", "model"))
        radii = jax.lax.pmax(aux["radii"], "data")
        visibility = jax.lax.pmax(aux["visibility"].astype(jnp.int32),
                                  "data") > 0
        # data-axis only: every model column rasterizes the same full
        # Gaussian set for its camera rows (gather_axis='model'), so
        # a model-axis psum would multiply the true count by m_cols
        n_dropped = jax.lax.psum(aux["n_dropped"], "data")

        xy_grad_norm = jnp.linalg.norm(screen_grad, axis=-1)
        gstate = G.add_densification_stats(state.gstate, xy_grad_norm,
                                           radii, visibility)

        g_updates, g_opt = trainer.g_tx.update(g_grads, state.g_opt,
                                               state.params)
        lr_tree = trainer._lr_tree(state.step)
        new_params = jax.tree_util.tree_map(
            lambda p, u, lr: p - lr * u, state.params, g_updates, lr_tree)

        sim_updates, sim_opt = trainer.sim_tx.update(sim_grads,
                                                     state.sim_opt,
                                                     state.sim_params)
        if static:
            new_sim = state.sim_params
            sim_opt = state.sim_opt
        else:
            sim_lr = trainer.cfg.meshnet.lr_init * trainer._tail_mult(
                state.step)
            new_sim = jax.tree_util.tree_map(
                lambda p, u: p - sim_lr * u, state.sim_params, sim_updates)

        new_state = SplatTrainState(new_params, gstate, g_opt, new_sim,
                                    sim_opt, state.step + 1)
        n_alive = jax.lax.psum(G.num_alive(gstate), "model")
        metrics = StepMetrics(loss=loss, psnr=psnr_v, l1=l1,
                              n_alive=n_alive, n_dropped=n_dropped)
        return new_state, metrics

    specs = splat_state_specs(state_template)
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(specs, P("data"), P(), P(), P()),
        out_specs=(specs, P()),
        check_vma=False,
    )

    def banked(state, cam_bank, gt_bank, mask_bank, view_idx, time_ids,
               knn_state, carry):
        cams = jax.tree_util.tree_map(lambda a: a[view_idx, time_ids],
                                      cam_bank)
        gts = gt_bank[view_idx, time_ids].astype(jnp.float32) / 255.0
        masks = (mask_bank[view_idx, time_ids] if has_masks
                 else jnp.zeros((), jnp.float32))
        if pad:
            # modular repeat: correct even when pad > n_cams (e.g. the
            # B=1 static stage on a data axis of 3+ rows)
            idx = jnp.arange(n_cams + pad) % n_cams
            cams = jax.tree_util.tree_map(lambda a: a[idx], cams)
        if not use_knn:
            knn_state = jnp.zeros((), jnp.float32)
        new_state, metrics = mapped(state, cams, gts, masks, knn_state)
        new_carry = StepCarry(
            ema_loss=0.4 * metrics.loss + 0.6 * carry.ema_loss,
            ema_psnr=0.4 * metrics.psnr + 0.6 * carry.ema_psnr,
            drop_accum=carry.drop_accum + metrics.n_dropped.astype(jnp.int32),
        )
        return new_state, metrics, new_carry

    return jax.jit(banked)


def make_sharded_meshnet_step(trainer, mesh: Mesh, future: int):
    """GNN train step with the batch sharded over the whole mesh (pure DP:
    per-sample message passing is independent until the loss/grad psum)."""
    flat = NamedSharding(mesh, P(("data", "model")))

    def place_batch(batch):
        return {k: jax.device_put(jnp.asarray(v), flat) for k, v in batch.items()}

    def step(state, opt_state, batch, key, lr):
        return trainer._train_step(state, opt_state, batch, key, lr, future)

    return jax.jit(step), place_batch
