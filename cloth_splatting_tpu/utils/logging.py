"""Observability: JSONL metrics logging + timestamped stdout + wall timers.

Replaces the reference's tqdm/TensorBoard/wandb triad (SURVEY.md section 5)
with a dependency-free JSONL stream any dashboard can tail. TensorBoard and
wandb hooks attach on top when available (never required).
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time
from typing import Any


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, step: int, **metrics: Any) -> None:
        if self._f is None:
            return
        rec = {"step": step, "ts": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


class Timer:
    """Pausable wall-clock timer (reference: utils/timer.py:2-23)."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def start(self):
        if self._start is None:
            self._start = time.time()
        return self

    def pause(self):
        if self._start is not None:
            self._elapsed += time.time() - self._start
            self._start = None
        return self

    def get_elapsed_time(self) -> float:
        if self._start is not None:
            return self._elapsed + time.time() - self._start
        return self._elapsed


def timestamp_stdout(silent: bool = False) -> None:
    """Wrap stdout so each line is suffixed with a timestamp
    (reference: utils/general_utils.py:115-131)."""
    old = sys.stdout

    class Wrapper:
        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                stamp = datetime.datetime.now().strftime("%d/%m %H:%M:%S")
                old.write(x.replace("\n", f" [{stamp}]\n"))
            else:
                old.write(x)

        def flush(self):
            old.flush()

    sys.stdout = Wrapper()


def seed_everything(seed: int) -> None:
    """Global seeding (python/numpy; JAX uses explicit keys)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
