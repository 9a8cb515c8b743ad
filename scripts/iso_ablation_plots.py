#!/usr/bin/env python
"""Isometry-ablation figures (reference scripts/iso_mte_plot.py +
iso_psnr_plot.py parity): PSNR and tracking-MTE vs lambda_rigid curves per
scene, read from experiment result files instead of hardcoded points."""

from __future__ import annotations

import argparse
import glob
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True,
                   help="root with <scene>_<lambda>/results.json + *_aligned.npz")
    p.add_argument("--out", type=str, default="iso_ablation.png")
    p.add_argument("--with_reference", action="store_true",
                   help="overlay the published CUDA-reference points "
                        "(scripts/iso_manual_points.py)")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    runs = []
    for res_path in sorted(glob.glob(os.path.join(args.root, "*", "results.json"))):
        run_dir = os.path.dirname(res_path)
        name = os.path.basename(run_dir)
        if "_l" not in name:
            continue
        scene, lam = name.rsplit("_l", 1)
        with open(res_path) as f:
            results = json.load(f)
        psnr = next((v["PSNR"] for v in results.values() if v.get("PSNR")), None)
        mte = None
        aligned = glob.glob(os.path.join(run_dir, "*aligned.npz"))
        if aligned:
            mte = float(np.load(aligned[0])["mte"].mean())
        runs.append({"scene": scene, "lambda": float(lam), "psnr": psnr, "mte": mte})

    if not runs:
        print("no runs found (expect dirs named <scene>_l<lambda>)")
        return

    scenes = sorted({r["scene"] for r in runs})
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for scene in scenes:
        rs = sorted([r for r in runs if r["scene"] == scene],
                    key=lambda r: r["lambda"])
        lams = [r["lambda"] for r in rs]
        ax1.plot(lams, [r["psnr"] for r in rs], marker="o", label=scene)
        if any(r["mte"] is not None for r in rs):
            ax2.plot(lams, [r["mte"] for r in rs], marker="o", label=scene)
    if args.with_reference:
        import iso_manual_points as ref
        for metric, ax in (("psnr", ax1), ("mte", ax2)):
            for scene, pts in ref.reference_points(metric).items():
                lams = sorted(pts)
                ax.plot(lams, [pts[l] for l in lams], marker="x",
                        linestyle="--", alpha=0.5, label=f"{scene} (ref)")

    for ax, ylabel in ((ax1, "PSNR [dB]"), (ax2, "MTE")):
        ax.set_xscale("log")
        ax.set_xlabel("lambda_rigid")
        ax.set_ylabel(ylabel)
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
