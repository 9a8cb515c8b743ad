"""Scene-parallel sweep driver: train S same-shape scenes simultaneously,
one per device (SURVEY.md section 2.3 axis (d); VERDICT r2 item 6).

The reference's ``run_all.sh`` trains its five folding scenes sequentially
on one GPU. Here scenes are grouped by static-shape signature (vertex /
face / edge counts, camera grid, resolution — garment types share one
group) and each group trains as ONE shard_map program over a ``('scene',)``
device mesh: every device runs the full train step on ITS scene's state,
camera bank and mesh, with ZERO collectives — the axis can ride DCN while
the intra-scene (data, model) mesh rides ICI.

Host-scheduled events (density control, capacity growth, barycentric
cleanup, eval, checkpoints) unstack the scene axis and reuse each scene's
own single-device Trainer programs — computation follows the data, so a
scene's densify runs on the device that owns it; capacities are re-equalized
group-wide afterwards (shared static shapes are the one constraint of the
axis).

Sampling uses ONE shared (view, time) draw per iteration from the SAME
dedicated sampling stream (``default_rng([seed, 1])``) train_scene draws
from, with per-scene init generators fresh at ``seed`` — so a sweep
consumes exactly the draw sequence of N independent sequential
``train_scene(seed)`` runs. tests/test_scene_sweep.py pins this
equivalence against an actual sequential run.
"""

from __future__ import annotations

import os
import time as time_mod
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.parallel.scenes import (
    make_scene_mesh,
    shard_scenes,
    stack_scene_states,
    unstack_scene_states,
)
from cloth_splatting_tpu.train.step import SplatTrainState, Trainer


def scene_signature(scene) -> tuple:
    """Static-shape signature; scenes in one group must share it."""
    mesh = scene.initial_mesh
    cam0 = scene.train.get(0, 0).camera
    return (
        int(mesh.pos.shape[0]), int(mesh.faces.shape[0]),
        int(mesh.edge_index.shape[1]),
        scene.train.n_views, scene.train.n_times,
        cam0.width, cam0.height,
        round(float(cam0.tanfovx), 6), round(float(cam0.tanfovy), 6),
        len(scene.mesh_predictions),
        # the position-LR spatial scale is baked into the group's shared
        # step program; scenes must agree on it
        round(float(scene.radius), 6),
    )


def group_scenes(scenes: Sequence) -> list[list[int]]:
    """Indices grouped by signature, capped at the device count."""
    by_sig: dict[tuple, list[int]] = {}
    for i, sc in enumerate(scenes):
        by_sig.setdefault(scene_signature(sc), []).append(i)
    n_dev = len(jax.devices())
    groups = []
    for idxs in by_sig.values():
        for k in range(0, len(idxs), n_dev):
            groups.append(idxs[k:k + n_dev])
    return groups


def _grow_to(state: SplatTrainState, new_cap: int) -> SplatTrainState:
    params, gstate, g_opt = G.grow_state_arrays(
        state.params, state.gstate, state.g_opt, new_cap)
    return state._replace(params=params, gstate=gstate, g_opt=g_opt)


def make_scene_group_step(trainer: Trainer, smesh, sh_degree: int,
                          static: bool, n_cams: int, has_masks: bool):
    """One shard_map program advancing S scenes, banked addressing inside.

    Inputs are scene-stacked: state pytree, camera/GT/mask banks
    [S, V, T, ...], per-scene mesh arrays and mesh_predictions. (view_idx,
    time_ids) are replicated scalars — the shared draw.
    """
    spec = P("scene")

    def one_scene(state, cam_bank, gt_bank, mask_bank, mesh, preds,
                  view_idx, time_ids):
        sq = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
        state1, mesh1 = sq(state), sq(mesh)
        cams = jax.tree_util.tree_map(lambda a: a[0, view_idx, time_ids],
                                      cam_bank)
        gts = gt_bank[0, view_idx, time_ids].astype(jnp.float32) / 255.0
        masks = mask_bank[0, view_idx, time_ids] if has_masks else None
        new_state, metrics = trainer._step_inner(
            state1, cams, gts, masks, sh_degree, static, has_masks,
            mesh=mesh1, mesh_predictions=preds[0])
        ex = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.expand_dims(x, 0), t)
        return ex(new_state), ex(metrics)

    mapped = jax.shard_map(
        one_scene, mesh=smesh,
        in_specs=(spec, spec, spec, spec if has_masks else P(), spec, spec,
                  P(), P()),
        out_specs=(spec, spec), check_vma=False)

    def step(state, cam_bank, gt_bank, mask_bank, mesh, preds, view_idx,
             time_ids):
        if not has_masks:
            mask_bank = jnp.zeros((), jnp.float32)
        return mapped(state, cam_bank, gt_bank, mask_bank, mesh, preds,
                      jnp.asarray(view_idx, jnp.int32),
                      jnp.asarray(time_ids, jnp.int32))

    return jax.jit(step)


def train_scene_group(
    cfg,
    scenes: Sequence,
    out_dirs: Sequence[str],
    test_iterations: Sequence[int] = (),
    save_iterations: Sequence[int] = (),
    seed: int = 6666,
    progress_every: int = 50,
    three_steps_batch: bool = True,
) -> list[SplatTrainState]:
    """Train one same-signature group of scenes in parallel; returns the
    final per-scene states. Mirrors train_scene's schedule."""
    from cloth_splatting_tpu.train.loop import (
        build_banks,
        evaluate_split,
        sample_time_ids,
        save_scene_checkpoint,
    )

    o = cfg.opt
    if o.lambda_isometric > 0 or o.lambda_spring > 0 or o.lambda_rigidity > 0:
        raise NotImplementedError(
            "kNN regularizers are not supported on the scene-parallel axis; "
            "run these configs sequentially (train.py) or on the intra-scene "
            "device mesh (train.py --mesh)")
    if getattr(o, "param_ema", 0.0) > 0:
        raise NotImplementedError(
            "param_ema evaluation is not implemented on the scene-parallel "
            "axis; a silent fall-through would make sweep evals raw-iterate "
            "while sequential evals are EMA (non-comparable results). Run "
            "EMA configs sequentially (train.py)")

    n_scenes = len(scenes)
    smesh = make_scene_mesh(n_scenes)
    for d in out_dirs:
        os.makedirs(d, exist_ok=True)

    trainers, states, banks = [], [], []
    for sc in scenes:
        cam0 = sc.train.get(0, 0).camera
        tr = Trainer(cfg, sc.initial_mesh, jnp.asarray(sc.mesh_predictions),
                     cam0.width, cam0.height, cam0.tanfovx, cam0.tanfovy,
                     sc.radius)
        trainers.append(tr)
        states.append(tr.init_state(np.random.default_rng(seed)))
        banks.append(build_banks(sc.train, sc.white_background))

    has_masks = any(b[2] is not None for b in banks)
    stacked = shard_scenes(stack_scene_states(states), smesh)
    cam_banks = shard_scenes(
        stack_scene_states([b[0] for b in banks]), smesh)
    gt_banks = shard_scenes(jnp.stack([b[1] for b in banks]), smesh)
    mask_banks = None
    if has_masks:
        ones = None
        mlist = []
        for b in banks:
            if b[2] is not None:
                mlist.append(b[2])
            else:
                if ones is None:
                    ones = jnp.ones_like(next(x[2] for x in banks
                                              if x[2] is not None))
                mlist.append(ones)
        mask_banks = shard_scenes(jnp.stack(mlist), smesh)
    meshes = shard_scenes(
        stack_scene_states([tr.mesh for tr in trainers]), smesh)
    preds = shard_scenes(
        jnp.stack([tr.mesh_predictions for tr in trainers]), smesh)

    steps: dict[tuple, object] = {}
    # the SAME dedicated sampling stream train_scene draws from — with
    # per-scene init generators fresh at `seed` (above), every random draw
    # of this sweep now matches a sequential train_scene(seed) run exactly
    rng = np.random.default_rng([seed, 1])
    key = jax.random.PRNGKey(seed)
    n_views, n_times = scenes[0].train.n_views, scenes[0].train.n_times
    sh_degree = 0
    t_start = time_mod.time()
    # k_cap overflow must never pass silently (train_scene's safeguard,
    # loop.py: a silent truncation once mis-scored a run by ~9 dB): a
    # device-resident accumulator, fetched at progress ticks; persistent
    # overflow auto-doubles the shared cfg's k_cap and drops compiled steps
    drop_accum = jnp.zeros((), jnp.int32)
    overflow_ticks = 0
    K_CAP_MAX = 8192

    for iteration in range(1, o.iterations + 1):
        static = o.static_reconst and iteration < o.static_reconst_iteration
        if iteration % 1000 == 0 and sh_degree < cfg.model.sh_degree:
            sh_degree += 1

        if static:
            vi, t_ids = iteration % n_views, [0]
        else:
            vi = int(rng.integers(n_views))
            t_ids = sample_time_ids(rng, n_times, three_steps_batch,
                                    getattr(o, "time_sample", "interior"))

        cap = stacked.params.face_bary.shape[1]
        skey = (len(t_ids), sh_degree, static, cap, o.raster_k_cap)
        if skey not in steps:
            steps[skey] = make_scene_group_step(
                trainers[0], smesh, sh_degree, static, len(t_ids), has_masks)
        stacked, metrics = steps[skey](stacked, cam_banks, gt_banks,
                                       mask_banks, meshes, preds, vi, t_ids)
        drop_accum = drop_accum + jnp.sum(metrics.n_dropped).astype(jnp.int32)

        key, sub = jax.random.split(key)
        if Trainer.density_control_due(cfg, iteration) \
                or iteration % o.bary_cleanup == 0:
            per_scene = unstack_scene_states(stacked, n_scenes)
            changed = False
            for i in range(n_scenes):
                if Trainer.density_control_due(cfg, iteration):
                    # The SAME key every scene: a solo train_scene(seed) run
                    # consumes this exact sequence, so sharing it is what
                    # keeps sweep == N independent sequential runs (the
                    # equivalence the test pins). Scenes differ in content,
                    # so the draws decorrelate through the state anyway.
                    per_scene[i], _ = trainers[i].density_control(
                        per_scene[i], iteration, sub)
                    changed = True
                if iteration % o.bary_cleanup == 0:
                    per_scene[i] = trainers[i].cleanup_barycentric(
                        per_scene[i])
                    changed = True
            if changed:
                max_cap = max(s.params.face_bary.shape[0]
                              for s in per_scene)
                per_scene = [_grow_to(s, max_cap) for s in per_scene]
                stacked = shard_scenes(stack_scene_states(per_scene), smesh)

        if iteration % progress_every == 0:
            m, dropped = jax.device_get((metrics, drop_accum))
            drop_accum = jnp.zeros((), jnp.int32)
            rate = iteration / (time_mod.time() - t_start)
            losses = " ".join(f"{float(v):.4f}" for v in m.loss)
            print(f"[sweep {'static' if static else 'dyn'} "
                  f"{iteration}/{o.iterations}] losses=[{losses}] "
                  f"({rate:.1f} it/s x {n_scenes} scenes)")
            if int(dropped) > 0:
                overflow_ticks += 1
                print(f"[sweep {iteration}] WARNING: rasterizer dropped "
                      f"{int(dropped)} tile instances since the last tick "
                      f"(k_cap={o.raster_k_cap})")
                if overflow_ticks >= 2 and o.raster_k_cap < K_CAP_MAX:
                    new_cap = trainers[0].grow_k_cap()
                    steps.clear()
                    overflow_ticks = 0
                    print(f"[sweep {iteration}] growing raster_k_cap -> "
                          f"{new_cap} (recompile)")

        if iteration in test_iterations or iteration in save_iterations:
            per_scene = unstack_scene_states(stacked, n_scenes)
            for i, st in enumerate(per_scene):
                st_h = jax.device_get(st)
                if iteration in test_iterations:
                    ev = evaluate_split(trainers[i], st_h, scenes[i].test,
                                        scenes[i].white_background,
                                        sh_degree)
                    print(f"[ITER {iteration}] scene {i} "
                          f"test psnr={ev['psnr']:.2f}")
                if iteration in save_iterations:
                    save_scene_checkpoint(out_dirs[i], iteration,
                                          trainers[i], st_h)

    return [jax.device_get(s)
            for s in unstack_scene_states(stacked, n_scenes)]


def train_scenes_parallel(
    cfg,
    scenes: Sequence,
    out_dirs: Sequence[str],
    **kw,
) -> list[SplatTrainState]:
    """Group scenes by signature and train each group in parallel; groups
    run one after another (host loop over groups)."""
    results: list = [None] * len(scenes)
    for idxs in group_scenes(scenes):
        group = [scenes[i] for i in idxs]
        outs = [out_dirs[i] for i in idxs]
        print(f"=== scene-parallel group {idxs} "
              f"({len(group)} scene(s)) ===")
        finals = train_scene_group(cfg, group, outs, **kw)
        for i, st in zip(idxs, finals):
            results[i] = st
    return results
