#!/usr/bin/env python
"""Probe the parity-bench optimization plateau (VERDICT r2 item 2).

parity_diag.py proved the GT is representable (re-rendering the TRUE
parameters scores ~60 dB against the stored PNGs), yet the fit stalls at
~25 dB train PSNR at 800px even with ZERO prediction noise — while the same
config at 128px climbs normally past 34 dB. This script separates the two
remaining explanations:

  * --mode truth : initialize the optimizer AT the true parameters and run
    real static train steps. PSNR collapsing from ~55 dB means the update
    itself destabilizes the optimum at this resolution (LR / schedule
    pathology); PSNR holding means the step is sound and the plateau is a
    basin-finding failure from the standard init.
  * --mode init  : standard init, with --lr_mult scaling the position-group
    LRs (and optionally --scale_lr_mult / --feature_lr_mult), to measure LR
    sensitivity of the plateau directly.

Prints one JSON line with the PSNR trajectory. No files are written.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=str, required=True)
    p.add_argument("--mode", choices=("truth", "init"), default="truth")
    p.add_argument("--iters", type=int, default=600)
    p.add_argument("--dynamic", action="store_true",
                   help="run dynamic-phase steps (3-time batches) instead of static")
    p.add_argument("--densify", action="store_true",
                   help="run density control on its normal schedule")
    p.add_argument("--lr_mult", type=float, default=1.0)
    p.add_argument("--scale_lr_mult", type=float, default=1.0)
    p.add_argument("--feature_lr_mult", type=float, default=1.0)
    p.add_argument("--every", type=int, default=25)
    p.add_argument("--backend", type=str, default="auto",
                   choices=("auto", "pallas", "tiled"),
                   help="rasterizer tier for the train step; the 128px CPU "
                        "control that converges runs 'tiled', the stalling "
                        "800px TPU runs 'pallas' — compare directly")
    p.add_argument("--seed", type=int, default=0,
                   help="must match the scene generator's seed in truth mode")
    p.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                   help="also track a Polyak average of (params, sim_params) "
                        "(config.param_ema semantics) and report psnr_ema at "
                        "each interval — the r4 diagnosis says the walk-away "
                        "is constant-LR Adam jitter around the optimum, so "
                        "the basin CENTER should hold >= init where the raw "
                        "iterate does not; not supported with --densify")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="GROUP.KEY=VALUE",
                   help="generic config override (repeatable), e.g. "
                        "--set opt.lambda_rigid=0 --set meshnet.lr_init=0 — "
                        "lets one probe isolate any regularizer/LR/schedule "
                        "suspect without a dedicated flag")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from cloth_splatting_tpu.data.scene import load_cloth_scene
    from cloth_splatting_tpu.data.synthetic import target_gaussians
    from cloth_splatting_tpu.train.config import Config
    from cloth_splatting_tpu.train.loop import build_banks
    from cloth_splatting_tpu.train.step import StepCarry, Trainer

    scene = load_cloth_scene(args.scene)
    cfg = Config()
    cfg.opt.raster_backend = args.backend
    cfg.opt.position_lr_init *= args.lr_mult
    cfg.opt.position_lr_final *= args.lr_mult
    cfg.opt.scaling_lr *= args.scale_lr_mult
    cfg.opt.rotation_lr *= args.scale_lr_mult
    cfg.opt.feature_lr *= args.feature_lr_mult
    cfg.opt.opacity_lr *= args.feature_lr_mult
    for ov in args.overrides:
        dotted, value = ov.split("=", 1)
        group_name, key = dotted.split(".", 1)
        group = getattr(cfg, group_name)
        old = getattr(group, key)  # KeyError-equivalent on typos
        cast = type(old) if old is not None else float
        setattr(group, key, cast(value) if cast is not bool
                else value.lower() in ("1", "true", "yes"))

    import jax.numpy as jnp

    mesh = scene.initial_mesh
    cam0 = scene.train.get(0, 0).camera
    trainer = Trainer(cfg, mesh, jnp.asarray(scene.mesh_predictions),
                      cam0.width, cam0.height, cam0.tanfovx, cam0.tanfovy,
                      scene.radius)
    rng = np.random.default_rng(args.seed)
    if args.mode == "truth":
        tparams, tstate = target_gaussians(mesh, sh_degree=3, seed=args.seed)
        state = trainer.init_state(rng, params=tparams, gstate=tstate)
    else:
        state = trainer.init_state(rng)

    cam_bank, gt_bank, mask_bank = build_banks(scene.train,
                                               scene.white_background)
    key = jax.random.PRNGKey(args.seed)
    carry = StepCarry.zeros()
    n_views, n_times = scene.train.n_views, scene.train.n_times
    srng = np.random.default_rng(args.seed + 7)

    if args.ema > 0 and args.densify:
        raise SystemExit("--ema does not implement densify row repair; "
                         "use train.py --param_ema for that path")
    ema_avg = None
    if args.ema > 0:
        ema_update = jax.jit(lambda avg, cur: jax.tree.map(
            lambda a, b: a * args.ema + (1.0 - args.ema) * b, avg, cur))

    traj = []
    for it in range(1, args.iters + 1):
        if args.dynamic:
            vi = int(srng.integers(n_views))
            mid = int(srng.integers(1, n_times - 1))
            t_ids = [mid - 1, mid, mid + 1]
        else:
            vi, t_ids = it % n_views, [0]
        state, metrics, carry = trainer.step_banked(
            state, cam_bank, gt_bank, mask_bank, vi, t_ids,
            sh_degree=3, static=not args.dynamic, carry=carry)
        if args.densify:
            key, sub = jax.random.split(key)
            state, _ = trainer.density_control(state, it, sub)
        if args.ema > 0:
            cur = (state.params, state.sim_params)
            ema_avg = cur if ema_avg is None else ema_update(ema_avg, cur)
        if it % args.every == 0 or it == 1:
            m = jax.device_get(metrics)
            traj.append({"it": it, "psnr": round(float(m.psnr), 2),
                         "loss": round(float(m.loss), 5),
                         "alive": int(m.n_alive)})
            if args.ema > 0:
                # metrics.psnr is computed at the PRE-update params, so a
                # step on a state with EMA params substituted measures the
                # averaged iterate through the identical compiled program
                # (the returned update is discarded)
                _, em, _ = trainer.step_banked(
                    state._replace(params=ema_avg[0], sim_params=ema_avg[1]),
                    cam_bank, gt_bank, mask_bank, vi, t_ids,
                    sh_degree=3, static=not args.dynamic,
                    carry=StepCarry.zeros())
                traj[-1]["psnr_ema"] = round(
                    float(jax.device_get(em).psnr), 2)
            print(traj[-1], flush=True)

    print(json.dumps({
        "metric": "opt_probe",
        "mode": args.mode,
        "backend": trainer.backend,
        "dynamic": args.dynamic,
        "densify": args.densify,
        "lr_mult": args.lr_mult,
        "scale_lr_mult": args.scale_lr_mult,
        "feature_lr_mult": args.feature_lr_mult,
        "overrides": args.overrides,
        "first_psnr": traj[0]["psnr"],
        "last_psnr": traj[-1]["psnr"],
        "min_psnr": min(t["psnr"] for t in traj),
        **({"ema": args.ema,
            "last_psnr_ema": traj[-1]["psnr_ema"],
            "min_psnr_ema": min(t["psnr_ema"] for t in traj
                                if "psnr_ema" in t)}
           if args.ema > 0 else {}),
        "trajectory": traj,
    }))


if __name__ == "__main__":
    main()
