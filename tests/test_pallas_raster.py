"""Pallas rasterizer vs oracle, in interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.ops.rasterize import rasterize_reference
from cloth_splatting_tpu.ops.rasterize.pallas_tiled import rasterize_pallas

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_rasterize import project_scene, W, H  # noqa: E402


class TestPallasParity:
    @pytest.mark.parametrize("seed", [0, 2])
    def test_matches_oracle(self, seed):
        proj = project_scene(n=64, seed=seed)
        rgb_o, dep_o, acc_o = rasterize_reference(proj, W, H, jnp.ones(3))
        rgb_p, dep_p, acc_p, _ = rasterize_pallas(
            proj, W, H, bg_static=(1.0, 1.0, 1.0), interpret=True)
        # early transmittance exit truncates invisible tails -> small tolerance
        np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_o), atol=3e-4)
        np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_o), atol=3e-4)
        np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_o), atol=3e-3)

    def test_empty_scene(self):
        proj = project_scene(n=8, seed=1)
        proj = proj._replace(valid=jnp.zeros_like(proj.valid))
        rgb, dep, acc, _ = rasterize_pallas(proj, W, H, (0.5, 0.5, 0.5),
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(rgb), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
