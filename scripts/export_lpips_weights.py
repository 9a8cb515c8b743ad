#!/usr/bin/env python
"""Export LPIPS-VGG weights to the npz layout cloth_splatting_tpu expects.

Run in ANY environment that has torch + lpips (and internet for the first
download); copy the resulting file next to your datasets and pass
``--lpips_weights`` to metrics.py.

Usage: python scripts/export_lpips_weights.py lpips_vgg.npz
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_pkg
    import torch

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    vgg = model.net.slice1  # slices 1..5
    slices = [model.net.slice1, model.net.slice2, model.net.slice3,
              model.net.slice4, model.net.slice5]
    for b, sl in enumerate(slices):
        i = 0
        for layer in sl:
            if isinstance(layer, torch.nn.Conv2d):
                w = layer.weight.detach().numpy()        # [cout, cin, kh, kw]
                out[f"conv_{b}_{i}_w"] = w.transpose(2, 3, 1, 0)  # HWIO
                out[f"conv_{b}_{i}_b"] = layer.bias.detach().numpy()
                i += 1
    for b, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()        # [1, C, 1, 1]
        out[f"lin_{b}"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
