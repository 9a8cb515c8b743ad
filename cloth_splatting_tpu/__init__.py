"""Cloth-Splatting TPU: a TPU-native (JAX/XLA/Pallas) cloth state-estimation framework.

Built from scratch with the capabilities of KTH-RPL/cloth-splatting (CoRL 2024):
action-conditioned MeshGraphNet dynamics prediction + mesh-anchored differentiable
3D Gaussian Splatting refinement, designed for TPU hardware (MXU-batched linear
algebra, static shapes, Pallas tile kernels, jax.sharding multi-chip meshes).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CST_PLATFORM"):
    # Explicit platform override for CLI chains (e.g. CST_PLATFORM=cpu
    # scripts/parity_bench.py): some environments boot-register an
    # accelerator backend at interpreter startup, where the plain
    # JAX_PLATFORMS env var no longer wins — the live-config update does,
    # as long as it happens before the first backend use (this package is
    # imported before any jax compute in every CLI).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CST_PLATFORM"])
