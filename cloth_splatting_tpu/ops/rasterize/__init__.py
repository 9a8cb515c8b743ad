"""Differentiable 3D Gaussian splatting rasterizers (TPU-native).

Three tiers, all sharing the EWA projection front-end (ops/projection.py):

  * ``reference``: per-pixel O(N * P) oracle in pure jnp. Ground truth for
    numerics + gradient tests; fine for tiny scenes.
  * ``tiled``: tile-binned XLA renderer. Depth sort + static-capacity per-tile
    instance lists built with one stable sort, compositing as a
    checkpointed scan. Fully differentiable via autodiff; the training tier.
  * ``pallas_tiled``: Pallas per-tile compositing kernel with dynamic trip
    counts (skips empty tiles/chunks). The serving/benchmark tier.

Replaces the reference's CUDA submodule ``depth-diff-gaussian-rasterization``
(contract: gaussian_renderer/__init__.py:156-164 — returns rendered_image
[3,H,W], radii [N], depth [1,H,W]).
"""

from cloth_splatting_tpu.ops.rasterize.reference import rasterize_reference
from cloth_splatting_tpu.ops.rasterize.tiled import rasterize_tiled

__all__ = ["rasterize_reference", "rasterize_tiled"]
