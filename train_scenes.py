#!/usr/bin/env python
"""Scene-parallel sweep CLI: train several scenes at once, one per device.

The reference's ``run_scripts/run_all.sh`` trains its folding scenes
sequentially on one GPU; this entry maps the sweep onto a ``('scene',)``
device mesh (cloth_splatting_tpu/parallel/sweep.py) — scenes with the same
static-shape signature (garment type) train simultaneously with zero
cross-device traffic. Single-device hosts degenerate to the sequential
loop. Shares train.py's flag surface for config overrides.

Usage:
  python train_scenes.py --scenes data/TSHIRT_01_00 data/TSHIRT_01_01 \
      --out_root ./output --configs cloth_splatting_tpu/configs/cloth_splatting/default.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import train as train_cli


def build_parser():
    parser = train_cli.build_parser()
    parser.add_argument("--scenes", nargs="+", required=True,
                        help="scene source directories")
    parser.add_argument("--out_root", type=str, default="./output",
                        help="per-scene outputs land in <out_root>/<scene name>")
    return parser


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = train_cli.config_from_args(args)

    from cloth_splatting_tpu.data.scene import load_cloth_scene
    from cloth_splatting_tpu.parallel.sweep import train_scenes_parallel
    from cloth_splatting_tpu.utils.logging import seed_everything, timestamp_stdout

    timestamp_stdout(args.quiet)
    seed_everything(args.seed)
    if not cfg.opt.no_coarse and not cfg.opt.static_reconst \
            and cfg.opt.coarse_iterations > 0:
        cfg.opt.static_reconst = True
        cfg.opt.static_reconst_iteration = cfg.opt.coarse_iterations

    time_skip = args.time_skip if args.time_skip and args.time_skip > 1 else None
    view_skip = args.view_skip if args.view_skip and args.view_skip > 1 else None
    scenes, out_dirs = [], []
    for src in args.scenes:
        scenes.append(load_cloth_scene(
            src, cfg.model.white_background, cfg.model.eval,
            time_skip=time_skip, view_skip=view_skip))
        out = os.path.join(args.out_root, os.path.basename(os.path.normpath(src)))
        out_dirs.append(out)
        os.makedirs(out, exist_ok=True)
        # cfg_args replay per scene so render.py/metrics.py work downstream
        import argparse as _ap

        replay = dict(vars(args), source_path=src, model_path=out)
        replay.pop("scenes", None)
        replay.pop("out_root", None)
        with open(os.path.join(out, "cfg_args"), "w") as f:
            f.write(repr(_ap.Namespace(**replay)))

    train_scenes_parallel(
        cfg, scenes, out_dirs,
        test_iterations=args.test_iterations,
        save_iterations=args.save_iterations,
        seed=args.seed,
        three_steps_batch=args.three_steps_batch,
    )
    print("\nSweep complete.")


if __name__ == "__main__":
    main()
