#!/usr/bin/env python
"""Dynamic cloth-scene optimization CLI.

Flag-surface parity with the reference train.py (train.py:355-441): param
groups auto-exposed as ``--<name>`` flags, ``--configs`` python-file overlay,
``-s/--source_path``, ``-m/--model_path``, test/save/checkpoint iterations,
``--expname``, skips (view/time), regularizer weights. Runs on TPU via JAX.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_parser() -> argparse.ArgumentParser:
    from cloth_splatting_tpu.train.config import (
        Config,
        MeshnetConfig,
        ModelConfig,
        OptimizationConfig,
        PipelineConfig,
    )

    parser = argparse.ArgumentParser(description="Cloth-Splatting TPU trainer")
    shorthand = {"source_path": "-s", "model_path": "-m", "images": "-i",
                 "resolution": "-r", "white_background": "-w"}
    seen = set()
    for group_cls in (ModelConfig, PipelineConfig, OptimizationConfig, MeshnetConfig):
        for f in dataclasses.fields(group_cls):
            if f.name in seen:
                continue
            seen.add(f.name)
            args = [f"--{f.name}"]
            if f.name in shorthand:
                args.append(shorthand[f.name])
            if f.type == "bool" or isinstance(f.default, bool):
                parser.add_argument(*args, default=None, action="store_true")
            else:
                parser.add_argument(*args, default=None, type=type(f.default))
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--protocol", type=str, default="json",
                        choices=["json", "sibr"],
                        help="viewer wire protocol: framework JSON codec or "
                             "the reference's SIBR byte protocol")
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[500, 1500, 3000, 4500, 6000, 7000, 7500, 8000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[8000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--expname", type=str, default="cloth_tpu")
    parser.add_argument("--configs", type=str, default="")
    parser.add_argument("--three_steps_batch", type=lambda v: v.lower() not in ("0", "false"),
                        default=True,
                        help="3-consecutive-time camera batches (default); "
                             "False = one random camera per iteration "
                             "(the reference's FourDGSdataset regime)")
    parser.add_argument("--view_skip", type=int, default=1)
    parser.add_argument("--time_skip", type=int, default=1)
    parser.add_argument("--single_cam_video", action="store_true")
    parser.add_argument("--no_shadow", action="store_true", default=True)
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--seed", type=int, default=6666)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--save_test_images", action="store_true", default=True)
    parser.add_argument("--mesh", type=str, default="",
                        help="multi-chip training over a (data, model) "
                             "device mesh: 'auto' (all devices, data axis "
                             "auto-chosen), 'DxM' (e.g. '2x4'), or '' "
                             "(single device, default). Camera rows shard "
                             "over 'data', the Gaussian capacity over "
                             "'model'; see cloth_splatting_tpu/parallel/.")
    return parser


def config_from_args(args) -> "Config":
    from cloth_splatting_tpu.train.config import Config, load_config_file

    cfg = Config()
    if args.configs:
        cfg = load_config_file(cfg, args.configs)
    for group in (cfg.model, cfg.pipeline, cfg.opt, cfg.meshnet):
        for f in dataclasses.fields(group):
            v = getattr(args, f.name, None)
            if v is not None:
                setattr(group, f.name, v)
    return cfg


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    from cloth_splatting_tpu.data.scene import load_cloth_scene
    from cloth_splatting_tpu.train.loop import train_scene
    from cloth_splatting_tpu.utils.logging import seed_everything, timestamp_stdout

    timestamp_stdout(args.quiet)
    seed_everything(args.seed)
    if args.detect_anomaly:
        # the reference's torch.autograd.set_detect_anomaly (train.py:435)
        from cloth_splatting_tpu.utils.profiling import enable_debug_checks
        enable_debug_checks()

    if not cfg.model.source_path:
        parser.error("--source_path/-s is required")
    if not cfg.model.model_path:
        cfg.model.model_path = os.path.join("./output/", args.expname)
    os.makedirs(cfg.model.model_path, exist_ok=True)

    # cfg_args replay file (render.py merges it back, reference train.py:266)
    with open(os.path.join(cfg.model.model_path, "cfg_args"), "w") as f:
        f.write(repr(argparse.Namespace(**vars(args))))

    # reference coarse-stage mapping: a "coarse" stage optimizes with the
    # deformation frozen, which is exactly the static stage here; when a
    # config enables coarse (no_coarse=False) without its own static stage,
    # run the static stage for coarse_iterations (reference train.py:243-247)
    if not cfg.opt.no_coarse and not cfg.opt.static_reconst \
            and cfg.opt.coarse_iterations > 0:
        cfg.opt.static_reconst = True
        cfg.opt.static_reconst_iteration = cfg.opt.coarse_iterations

    print(f"Optimizing {cfg.model.model_path}")
    time_skip = args.time_skip if args.time_skip and args.time_skip > 1 else None
    view_skip = args.view_skip if args.view_skip and args.view_skip > 1 else None
    scene = load_cloth_scene(
        cfg.model.source_path, cfg.model.white_background, cfg.model.eval,
        time_skip=time_skip, view_skip=view_skip,
        single_cam_video=args.single_cam_video,
    )
    # live viewer socket (the reference's network_gui.init, train.py:439)
    viewer_enabled = False
    try:
        from cloth_splatting_tpu.utils import viewer

        viewer.init(args.ip, args.port, wire_protocol=args.protocol)
        viewer_enabled = True
    except OSError as exc:
        print(f"viewer disabled ({exc})")

    wandb = None
    if args.use_wandb:
        from cloth_splatting_tpu.utils.logging import WandbAdapter

        wandb = WandbAdapter(project=args.expname, name=args.expname,
                             config=vars(args), enabled=True)

    device_mesh = None
    if args.mesh:
        import jax

        from cloth_splatting_tpu.parallel.mesh import make_mesh

        if args.mesh == "auto":
            if len(jax.devices()) > 1:
                device_mesh = make_mesh()
        else:
            try:
                d, m = (int(v) for v in args.mesh.lower().split("x"))
            except ValueError:
                parser.error(f"--mesh must be 'auto' or 'DxM', got {args.mesh!r}")
            if d * m > len(jax.devices()):
                parser.error(f"--mesh {args.mesh} needs {d * m} devices, "
                             f"have {len(jax.devices())}")
            device_mesh = make_mesh(d * m, data=d)

    train_scene(
        cfg, scene, cfg.model.model_path,
        test_iterations=args.test_iterations,
        save_iterations=args.save_iterations,
        checkpoint_iterations=args.checkpoint_iterations,
        start_checkpoint=args.start_checkpoint,
        seed=args.seed,
        three_steps_batch=args.three_steps_batch,
        save_test_images=args.save_test_images,
        wandb=wandb,
        viewer_enabled=viewer_enabled,
        device_mesh=device_mesh,
    )
    if wandb is not None:
        wandb.finish()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
