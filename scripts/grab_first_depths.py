#!/usr/bin/env python
"""Inspect the depth channel of exported deform logs (reference
scripts/grab_first_depths.py parity): load a deform_log npz, print the depth
shape/stats and optionally save the first depth map as a normalized PNG."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", type=str, required=True,
                   help="deform_log_*.npz with a 'depth' array")
    p.add_argument("--out", type=str, default=None,
                   help="optional normalized depth PNG path")
    args = p.parse_args(argv)

    data = np.load(args.input)
    depth = data["depth"]
    print("depth shape:", depth.shape)
    finite = depth[np.isfinite(depth) & (depth > 0)]
    if finite.size:
        print(f"range: [{finite.min():.4f}, {finite.max():.4f}] "
              f"mean {finite.mean():.4f}")
    if args.out:
        import imageio.v2 as imageio

        d = depth[0] if depth.ndim == 3 else depth
        lo, hi = (finite.min(), finite.max()) if finite.size else (0.0, 1.0)
        norm = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
        imageio.imwrite(args.out, (norm * 255).astype(np.uint8))
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
