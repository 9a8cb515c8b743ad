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


class TensorBoardAdapter:
    """Optional TensorBoard scalars/images (the reference's tb usage,
    train.py:269-342). No-ops silently when tensorboard is unavailable."""

    def __init__(self, log_dir: str | None):
        self._writer = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._writer = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def image(self, tag: str, img_chw, step: int) -> None:
        if self._writer is not None:
            self._writer.add_image(tag, img_chw, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class WandbAdapter:
    """Optional wandb logging (reference train_meshnet_sim.py:383-549).
    No-ops when wandb is not installed or disabled."""

    def __init__(self, project: str | None = None, name: str | None = None,
                 config: Any = None, enabled: bool = False):
        self._run = None
        if enabled:
            try:
                import wandb

                self._run = wandb.init(project=project, name=name, config=config)
            except Exception:
                self._run = None

    def log(self, metrics: dict, step: int | None = None) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()


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
