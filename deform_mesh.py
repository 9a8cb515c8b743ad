#!/usr/bin/env python
"""Randomized deformed-cloth-mesh generation CLI (reference
manipulation/deform_mesh.py parity): drops a cloth with randomized physics,
applies a keypoint-biased circular fold (ARTF) or a random drag
(ClothFunnels), and exports the observed mesh sequence per sample."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Generate randomized deformed cloth meshes")
    p.add_argument("--out", type=str, default="./deformed_meshes")
    p.add_argument("--config", choices=["artf", "clothfunnels"], default="artf")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--nx", type=int, default=16)
    p.add_argument("--ny", type=int, default=16)
    p.add_argument("--cloth_size", type=float, default=0.3)
    p.add_argument("--fold_steps", type=int, default=24)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from cloth_splatting_tpu.manipulation.deform_mesh import (
        ARTFDeformationConfig,
        ClothFunnelsDeformationConfig,
        generate_deformed_meshes,
    )

    config = (ARTFDeformationConfig() if args.config == "artf"
              else ClothFunnelsDeformationConfig())
    dirs = generate_deformed_meshes(
        config, args.out, n_samples=args.n_samples, seed=args.seed,
        nx=args.nx, ny=args.ny, cloth_size=args.cloth_size,
        fold_steps=args.fold_steps, image_size=args.image_size)
    for d in dirs:
        print(d)


if __name__ == "__main__":
    main()
