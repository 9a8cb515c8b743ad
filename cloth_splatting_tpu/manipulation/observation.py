"""Observation synthesis for the closed manipulation loop.

Replaces the reference's Blender pipeline (manipulation/fold_rendering/*,
contract at SURVEY.md section 3.4: ``Renderer(target_mesh_path, obj_folder)``
with ``process_obj_traj`` + ``obj_to_rgb``): multi-view RGB observations of
the TRUE cloth state are rendered with the framework's own splat renderer
from a textured Gaussian field anchored on the observation mesh, and written
incrementally into a NeRF-synthetic scene directory that SingleStepOptimizer
re-reads each planning step.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.data.predictions import mesh_from_positions, save_mesh_predictions
from cloth_splatting_tpu.data.synthetic import (
    camera_to_transform_matrix,
    orbit_camera,
    target_gaussians,
)
from cloth_splatting_tpu.render import camera_arrays, render


class ObservationSynthesizer:
    """Renders cloth states into an incrementally growing scene directory."""

    def __init__(self, scene_dir: str, faces: np.ndarray, rest_positions: np.ndarray,
                 n_views: int = 5, image_size: int = 128, n_times_max: int = 16,
                 fov: float = 2 * np.arctan(0.4), white_background: bool = True,
                 seed: int = 0):
        self.scene_dir = scene_dir
        self.n_views = n_views
        self.image_size = image_size
        self.n_times_max = n_times_max
        self.fov = fov
        self.white_background = white_background
        os.makedirs(scene_dir, exist_ok=True)

        self.mesh = mesh_from_positions(rest_positions, faces)
        self.appearance, self.gstate = target_gaussians(self.mesh, sh_degree=3,
                                                        seed=seed)
        self.frames_train: list[dict] = []
        self.frames_test: list[dict] = []
        self.n_times = 0

    def _time_value(self, t_idx: int) -> float:
        return t_idx / max(self.n_times_max - 1, 1)

    def render_state(self, positions: np.ndarray, t_idx: int) -> None:
        """Render all views of one cloth state and append frames."""
        import imageio.v2 as imageio

        bg = jnp.ones(3) if self.white_background else jnp.zeros(3)
        verts = jnp.asarray(positions, jnp.float32)
        # manipulation scenes are y-up; cameras orbit above the cloth plane
        for vi in range(self.n_views):
            cam = orbit_camera(vi, self.n_views, self.fov, self.image_size,
                               self.image_size, self._time_value(t_idx),
                               radius=1.2, elevation=0.9)
            out = render(camera_arrays(cam), self.image_size, self.image_size,
                         cam.tanfovx, cam.tanfovy, self.appearance, self.gstate,
                         self.mesh, None, None, bg, 3,
                         override_vertices=verts, k_cap=192, k_chunk=16)
            img = np.asarray(jnp.clip(out.rgb, 0, 1) * 255).astype(np.uint8)
            alpha = np.asarray(jnp.clip(out.alpha[0], 0, 1) * 255).astype(np.uint8)
            rgba = np.concatenate([img.transpose(1, 2, 0), alpha[..., None]], -1)
            split = "test" if vi == self.n_views - 1 else "train"
            sub = os.path.join(self.scene_dir, split)
            os.makedirs(sub, exist_ok=True)
            name = f"r_{vi}_{t_idx}"
            imageio.imwrite(os.path.join(sub, name + ".png"), rgba)
            frame = {
                "file_path": f"{split}/{name}",
                "time": self._time_value(t_idx),
                "transform_matrix": camera_to_transform_matrix(cam).tolist(),
            }
            (self.frames_test if split == "test" else self.frames_train).append(frame)
        self.n_times = max(self.n_times, t_idx + 1)
        self._write_transforms()

    def _write_transforms(self) -> None:
        for split, frames in (("train", self.frames_train),
                              ("test", self.frames_test)):
            meta = {"camera_angle_x": float(self.fov),
                    "camera_angle_y": float(self.fov), "frames": frames}
            with open(os.path.join(self.scene_dir,
                                   f"transforms_{split}.json"), "w") as f:
                json.dump(meta, f)

    def write_mesh_predictions(self, positions_over_time: np.ndarray) -> None:
        """Persist the GNN/refined mesh states train.py-style."""
        save_mesh_predictions(self.scene_dir, np.asarray(self.mesh.faces),
                              positions_over_time)
