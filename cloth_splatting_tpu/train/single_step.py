"""Continual / online splat optimization for closed-loop planning.

Parity with the reference SingleStepOptimizer (train_utils.py:348-556):
``initialize`` -> static fit of the first frame, ``update_data`` -> re-read
the (grown) scene, ``update_mesh_predictions`` -> refine the residual
simulator + Gaussians against the newest observations with linearly-weighted
time sampling favoring recent frames, ``refined_positions`` -> the corrected
mesh states the planner feeds back into the GNN history (the "update" half
of predict-update).

The residual simulator's time axis is pinned to ``n_times_max`` so its
time->index mapping stays fixed while observations stream in; the
mesh-prediction buffer is padded by repeating the last known state.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.data.scene import load_cloth_scene
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.loop import build_banks, save_scene_checkpoint
from cloth_splatting_tpu.train.step import SplatTrainState, Trainer


class SingleStepOptimizer:
    def __init__(self, cfg: Config, scene_dir: str, n_times_max: int,
                 save_path: str | None = None, seed: int = 0):
        self.cfg = cfg
        self.scene_dir = scene_dir
        self.n_times_max = n_times_max
        self.save_path = save_path or cfg.model.model_path or scene_dir + "_model"
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.last_iters = 0
        self.trainer: Trainer | None = None
        self.state: SplatTrainState | None = None

    # ------------------------------------------------------------------ data

    def _padded_predictions(self, preds: np.ndarray) -> jnp.ndarray:
        t = preds.shape[0]
        if t < self.n_times_max:
            pad = np.repeat(preds[-1:], self.n_times_max - t, axis=0)
            preds = np.concatenate([preds, pad], axis=0)
        return jnp.asarray(preds[: self.n_times_max])

    def initialize(self) -> None:
        self.scene = load_cloth_scene(self.scene_dir,
                                      self.cfg.model.white_background,
                                      eval_split=False)
        preds = self._padded_predictions(self.scene.mesh_predictions)
        cam0 = self.scene.train.get(0, 0).camera
        self.trainer = Trainer(self.cfg, self.scene.initial_mesh, preds,
                               cam0.width, cam0.height, cam0.tanfovx,
                               cam0.tanfovy, self.scene.radius)
        self.state = self.trainer.init_state(self.rng)
        self._rebuild_banks()

    def update_data(self, n_times: int = -1) -> None:
        """Re-read the scene directory after new observations landed
        (train_utils.py:396-408); Gaussians persist, the simulator's
        prediction buffer refreshes."""
        self.scene = load_cloth_scene(self.scene_dir,
                                      self.cfg.model.white_background,
                                      eval_split=False)
        preds = self.scene.mesh_predictions
        if n_times > 0:
            preds = preds[:n_times]
        new_preds = self._padded_predictions(preds)
        old = self.trainer
        self.trainer = Trainer(self.cfg, self.scene.initial_mesh, new_preds,
                               old.width, old.height, old.tanfovx, old.tanfovy,
                               self.scene.radius)
        self._rebuild_banks()

    def _rebuild_banks(self) -> None:
        self.cam_bank, self.gt_bank, self.mask_bank = build_banks(
            self.scene.train, self.cfg.model.white_background)
        self.n_times = self.scene.train.n_times

    # -------------------------------------------------------------- training

    def static_reconstruction(self, train_steps: int | None = None) -> None:
        steps = train_steps or self.cfg.opt.static_reconst_iteration
        for it in range(1, steps + 1):
            vi = it % self.scene.train.n_views
            self.state, metrics = self.trainer.step_banked(
                self.state, self.cam_bank, self.gt_bank, self.mask_bank,
                vi, [0], sh_degree=0, static=True)
            self.key, sub = jax.random.split(self.key)
            self.state, _ = self.trainer.density_control(self.state, it, sub)
            if it % self.cfg.opt.bary_cleanup == 0:
                self.state = self.trainer.cleanup_barycentric(self.state)
        self.last_iters = steps
        print(f"[single-step] static fit done: psnr={float(metrics.psnr):.2f}")

    def update_mesh_predictions(self, train_steps: int = 1000) -> None:
        """Refine simulator + Gaussians on all observed times, sampling mid
        times with linearly increasing weight toward the newest observation
        (train_utils.py:478-498)."""
        n_times = self.n_times
        for it in range(self.last_iters + 1, self.last_iters + train_steps + 1):
            vi = it % self.scene.train.n_views
            if n_times >= 3:
                w = np.linspace(0.5, 1.5, n_times - 2)
                mid = int(self.rng.choice(np.arange(1, n_times - 1), p=w / w.sum()))
                t_ids = [mid - 1, mid, mid + 1]
            else:
                t_ids = list(range(n_times))
            self.state, metrics = self.trainer.step_banked(
                self.state, self.cam_bank, self.gt_bank, self.mask_bank,
                vi, t_ids, sh_degree=0, static=False)
        self.last_iters += train_steps

    # ----------------------------------------------------------------- output

    def refined_positions(self) -> np.ndarray:
        """Simulator-refined mesh states for every observed time [T, V, 3]."""
        from cloth_splatting_tpu.models.deform import simulate_any

        out = []
        for t_idx in range(self.n_times):
            t = t_idx / max(self.n_times_max - 1, 1)
            out.append(np.asarray(simulate_any(self.state.sim_params,
                                               self.trainer.mesh_predictions,
                                               jnp.asarray(t, jnp.float32))))
        return np.stack(out)

    def save(self) -> None:
        iteration = self.last_iters
        save_scene_checkpoint(self.save_path, iteration, self.trainer, self.state)
