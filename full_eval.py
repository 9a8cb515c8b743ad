#!/usr/bin/env python
"""Batch train+render+metrics harness (reference full_eval.py parity).

The reference version shells out over MipNeRF-360/T&T/DeepBlending scene
lists left over from 3DGS and is non-functional for cloth scenes (SURVEY.md
section 2.2); this one drives the actual cloth pipeline over a scene list.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", "-d", type=str, required=True)
    p.add_argument("--output_root", "-o", type=str, default="./output")
    p.add_argument("--scenes", nargs="+",
                   default=["TOWEL_00_03", "TSHIRT_01_00", "TSHIRT_01_01",
                            "SHORTS_01_00", "SHORTS_01_01"])
    p.add_argument("--configs", type=str,
                   default="cloth_splatting_tpu/configs/cloth_splatting/default.py")
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_rendering", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--view_skip", type=int, default=3)
    args = p.parse_args(argv)

    py = sys.executable
    for scene in args.scenes:
        src = os.path.join(args.data_root, scene)
        out = os.path.join(args.output_root, scene)
        if not args.skip_training:
            run([py, os.path.join(HERE, "train.py"), "-s", src, "-m", out,
                 "--configs", args.configs, "--view_skip", str(args.view_skip),
                 "--expname", scene])
        if not args.skip_rendering:
            run([py, os.path.join(HERE, "render.py"), "-m", out, "-s", src,
                 "--skip_train", "--log_deform"])
        if not args.skip_metrics:
            run([py, os.path.join(HERE, "metrics.py"), "-m", out])
    run([py, os.path.join(HERE, "scripts", "read_all_metrics.py"),
         "--root", args.output_root])


if __name__ == "__main__":
    main()
