#!/usr/bin/env python
"""NVS metrics CLI (reference metrics.py:40-119 parity).

Walks ``<model>/test/ours_<it>/{renders,gt}``, computes SSIM / PSNR /
LPIPS-vgg, writes ``results.json``, ``per_view.json`` and ``results.txt``
with the same schema. ``--splits test train`` additionally scores the train
renders (keys namespaced ``train/<method>`` so the reference test-split
schema is unchanged). LPIPS requires a weights file
(see scripts/export_lpips_weights.py) since this environment bundles no
pretrained VGG; without one it reports null.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def evaluate(model_paths, lpips_weights_path=None, splits=("test",)):
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from cloth_splatting_tpu.eval import lpips_jax
    from cloth_splatting_tpu.ops.image import psnr as psnr_fn
    from cloth_splatting_tpu.ops.ssim import ssim as ssim_fn

    if lpips_jax.available(lpips_weights_path):
        lpips_w = lpips_jax.load_weights(lpips_weights_path)
        lpips_kind = "pretrained"
    else:
        # deterministic fixture so the metric triple is always complete;
        # values are reproducible regression numbers, NOT comparable to
        # published LPIPS (see eval/lpips_jax.py docstring)
        lpips_w = lpips_jax.fixture_weights()
        lpips_kind = lpips_jax.FIXTURE_VERSION
        print("LPIPS: no pretrained weights provided; using the "
              f"deterministic {lpips_kind} weights "
              "(see scripts/export_lpips_weights.py for real LPIPS-vgg)")

    for model_path in model_paths:
        print(f"Scene: {model_path}")
        full, per_view = {}, {}
        split_methods = []
        for split in splits:
            split_dir = os.path.join(model_path, split)
            if not os.path.isdir(split_dir):
                print(f"  no {split} dir in {model_path}")
                continue
            for method in sorted(os.listdir(split_dir)):
                split_methods.append((split, method))
        for split, method in split_methods:
            mdir = os.path.join(model_path, split, method)
            renders_dir = os.path.join(mdir, "renders")
            gt_dir = os.path.join(mdir, "gt")
            if not (os.path.isdir(renders_dir) and os.path.isdir(gt_dir)):
                continue
            # keep the reference results.json schema (keys are method names)
            # for the default test split; extra splits are namespaced.
            key = method if split == "test" else f"{split}/{method}"
            print(f"  method: {key}")
            names = sorted(os.listdir(renders_dir))
            ssims, psnrs, lpipss = [], [], []
            for name in names:
                gt_path = os.path.join(gt_dir, name)
                if not os.path.exists(gt_path):
                    continue
                r = np.asarray(Image.open(os.path.join(renders_dir, name)).convert("RGB"),
                               np.float32).transpose(2, 0, 1) / 255.0
                g = np.asarray(Image.open(gt_path).convert("RGB"),
                               np.float32).transpose(2, 0, 1) / 255.0
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                ssims.append(float(ssim_fn(rj, gj)))
                psnrs.append(float(psnr_fn(rj, gj)))
                if lpips_w is not None:
                    lpipss.append(float(lpips_jax.lpips(lpips_w, rj[None], gj[None])[0]))
            res = {
                "SSIM": float(np.mean(ssims)) if ssims else None,
                "PSNR": float(np.mean(psnrs)) if psnrs else None,
                "LPIPS": float(np.mean(lpipss)) if lpipss else None,
            }
            print(f"    SSIM: {res['SSIM']}  PSNR: {res['PSNR']}  LPIPS: {res['LPIPS']}")
            res["lpips_weights"] = lpips_kind
            full[key] = res
            per_view[key] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
                "LPIPS": dict(zip(names, lpipss)) if lpipss else {},
            }
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)
        with open(os.path.join(model_path, "results.txt"), "w") as f:
            for method, res in full.items():
                f.write(f"{method}: SSIM {res['SSIM']} PSNR {res['PSNR']} "
                        f"LPIPS {res['LPIPS']}\n")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="NVS metric evaluation")
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--lpips_weights", type=str, default=None)
    parser.add_argument("--splits", nargs="+", default=["test"],
                        help="render splits to score (default: test, the "
                             "reference schema; add train for diagnostics)")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, args.lpips_weights, splits=tuple(args.splits))


if __name__ == "__main__":
    main()
