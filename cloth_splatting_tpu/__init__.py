"""Cloth-Splatting TPU: a TPU-native (JAX/XLA/Pallas) cloth state-estimation framework.

Built from scratch with the capabilities of KTH-RPL/cloth-splatting (CoRL 2024):
action-conditioned MeshGraphNet dynamics prediction + mesh-anchored differentiable
3D Gaussian Splatting refinement, designed for TPU hardware (MXU-batched linear
algebra, static shapes, Pallas tile kernels, jax.sharding multi-chip meshes).
"""

__version__ = "0.1.0"
