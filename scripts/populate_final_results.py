#!/usr/bin/env python
"""Populate a final-results tree from trained experiment outputs (reference
scripts/populate_final_results.py parity): for every scene directory under
--output, align its exported trajectories against the dataset ground truth
with align_eval_trajs.py, then copy the aligned trajectory into
<results>/<scene>/ours/traj.npz."""

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
                   help="experiment root with <scene>/<test_path>/all_trajs.npz")
    p.add_argument("--test_path", type=str, default="test/ours_8000")
    args = p.parse_args(argv)

    # in-process (one jax runtime) — the reference shells out per scene
    from cloth_splatting_tpu.eval.tracking import evaluate_tracking

    scene_dirs = sorted(d for d in glob.glob(os.path.join(args.output, "*"))
                        if os.path.isdir(d))
    for scene_dir in scene_dirs:
        scene = os.path.basename(scene_dir)
        traj_path = os.path.join(scene_dir, args.test_path, "all_trajs.npz")
        gt_path = os.path.join(args.results, scene, "gt.npz")
        if not (os.path.exists(traj_path) and os.path.exists(gt_path)):
            print(f"skip {scene}: missing {'trajs' if not os.path.exists(traj_path) else 'gt'}")
            continue
        aligned = traj_path.replace(".npz", "_aligned.npz")
        res = evaluate_tracking(traj_path, gt_path, save_aligned=aligned)
        print(f"{scene}: MTE mean {res['mte_mean'] * 1000.0:.3f} mm")
        out_dir = os.path.join(args.results, scene, "ours")
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        shutil.copyfile(aligned, os.path.join(out_dir, "traj.npz"))
        print(f"{scene}: -> {os.path.join(out_dir, 'traj.npz')}")


if __name__ == "__main__":
    main()
