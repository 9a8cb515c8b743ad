"""Scene-level data parallelism: one scene per device (DCN axis).

SURVEY.md section 2.3's fourth TPU-native parallelism axis: ``run_all``-style
sweeps (reference run_scripts/run_all.sh trains five folding scenes
sequentially on one GPU) map onto a ``('scene',)`` device mesh — every
device optimizes an independent scene (or an independent seed/hyperparameter
replicate of the same scene), no collectives anywhere, so the axis can ride
DCN across hosts while the intra-scene 'data' x 'model' mesh rides ICI.

The only constraint is static-shape equality across scenes (same Gaussian
capacity, image size, camera-batch size, vertex count) — exactly what the
folding-scenes sweep satisfies.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_scene_mesh(n_scenes: int | None = None) -> Mesh:
    """A 1-D ('scene',) mesh over the first n_scenes devices."""
    devs = jax.devices()
    n = n_scenes or len(devs)
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), ("scene",))


def stack_scene_states(states: list[Any]) -> Any:
    """Stack S per-scene pytrees along a new leading scene axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_scene_states(stacked: Any, n_scenes: int) -> list[Any]:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_scenes)]


def shard_scenes(tree: Any, mesh: Mesh) -> Any:
    """Place a scene-stacked pytree with the leading axis over 'scene'."""
    sh = NamedSharding(mesh, P("scene"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_scene_parallel_step(trainer, mesh: Mesh, sh_degree: int,
                             static: bool):
    """A jitted step that advances S independent scenes, one per device.

    Inputs are scene-stacked pytrees (leading axis S = mesh size): states,
    camera batches [S, B_cam, ...], ground-truth banks [S, B_cam, 3, H, W].
    Returns (stacked states, stacked metrics). Implemented with shard_map so
    XLA compiles ONE per-device program with zero cross-device traffic.
    """
    spec = P("scene")

    def one_scene(state, cams, gts):
        # shard_map hands each device its [1, ...] slice; squeeze it
        state1 = jax.tree.map(lambda x: x[0], state)
        cams1 = jax.tree.map(lambda x: x[0], cams)
        gts1 = gts[0]
        new_state, metrics = trainer._step_inner(
            state1, cams1, gts1, None, sh_degree, static, False)
        expand = lambda x: jnp.expand_dims(x, 0)
        return jax.tree.map(expand, new_state), jax.tree.map(expand, metrics)

    mapped = jax.shard_map(one_scene, mesh=mesh,
                           in_specs=(spec, spec, spec),
                           out_specs=(spec, spec), check_vma=False)
    return jax.jit(mapped)
