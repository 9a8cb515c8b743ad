#!/usr/bin/env python
"""Populate the isometry-ablation results tree (reference
scripts/populate_iso_ablation.py parity).

Experiment dirs are named ``<scene>_<iso>`` (e.g. ``towel_flat_0.5``) under
--output; for each, the exported ``all_trajs.npz`` under --test_path is
aligned against ``<results>/<scene>/gt.npz`` with align_eval_trajs.py and
the aligned trajectory is copied to ``<results>/<scene>/<iso>/traj.npz`` —
the layout scripts/iso_ablation_plots.py consumes.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--results", type=str, required=True,
                   help="results root with <scene>/gt.npz")
    p.add_argument("--output", type=str, required=True,
                   help="experiment root with <scene>_<iso>/ dirs")
    p.add_argument("--test_path", type=str, default="test/ours_8000")
    args = p.parse_args(argv)

    # in-process (one jax runtime) — the reference shells out per scene,
    # which costs a full interpreter + import per alignment
    from cloth_splatting_tpu.eval.tracking import evaluate_tracking

    out_dirs = sorted(d for d in glob.glob(os.path.join(args.output, "*"))
                      if os.path.isdir(d))
    for exp_dir in out_dirs:
        name = os.path.basename(exp_dir)
        # <scene>_<iso>: the reference splits on "_" keeping the first two
        # pieces as the scene name and the last as the iso weight
        parts = name.split("_")
        if len(parts) < 2:
            print(f"skip {name}: not a <scene>_<iso> dir")
            continue
        try:
            iso = float(parts[-1])
        except ValueError:
            print(f"skip {name}: suffix {parts[-1]!r} is not an iso weight")
            continue
        scene = "_".join(parts[:-1])

        traj_path = os.path.join(exp_dir, args.test_path, "all_trajs.npz")
        gt_path = os.path.join(args.results, scene, "gt.npz")
        if not (os.path.exists(traj_path) and os.path.exists(gt_path)):
            print(f"skip {name}: missing "
                  f"{'trajs' if not os.path.exists(traj_path) else 'gt'}")
            continue
        aligned = traj_path.replace(".npz", "_aligned.npz")
        res = evaluate_tracking(traj_path, gt_path, save_aligned=aligned)
        print(f"{name}: MTE mean {res['mte_mean'] * 1000.0:.3f} mm")
        out_dir = os.path.join(args.results, scene, str(iso))
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        shutil.copyfile(aligned, os.path.join(out_dir, "traj.npz"))
        print(f"{name}: -> {os.path.join(out_dir, 'traj.npz')}")


if __name__ == "__main__":
    main()
