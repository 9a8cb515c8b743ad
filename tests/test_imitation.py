"""Demo record/imitate + coverage metric tests
(reference manipulation/imitation.py, eval_utils.py:22-57)."""

import numpy as np
import pytest

from cloth_splatting_tpu.manipulation.env import ClothEnv
from cloth_splatting_tpu.manipulation.imitation import (
    HalfFoldConfig,
    covered_area,
    imitate_demo,
    load_demo,
    record_demo,
)


class TestCoverage:
    def test_flat_cloth_covers_its_footprint(self):
        pts = np.stack(np.meshgrid(np.linspace(0, 0.3, 10),
                                   np.linspace(0, 0.3, 10)),
                       axis=-1).reshape(-1, 2)
        pos = np.concatenate([pts[:, :1], np.zeros((100, 1)), pts[:, 1:]], 1)
        area = covered_area(pos, particle_radius=0.02)
        assert 0.03 < area < 0.15   # ~0.09 true footprint, grid-stamped

    def test_folded_cloth_covers_less(self):
        pts = np.stack(np.meshgrid(np.linspace(0, 0.3, 10),
                                   np.linspace(0, 0.3, 10)),
                       axis=-1).reshape(-1, 2)
        flat = np.concatenate([pts[:, :1], np.zeros((100, 1)), pts[:, 1:]], 1)
        folded = flat.copy()
        folded[:, 0] = np.abs(folded[:, 0] - 0.15)   # fold in half
        assert covered_area(folded) < covered_area(flat) * 0.75


class TestDemoLoop:
    def test_record_and_imitate(self, tmp_path):
        cfg = HalfFoldConfig(n_steps=6)
        env = ClothEnv(nx=8, ny=8, seed=0)
        out = str(tmp_path / "data.h5")
        demo = record_demo(env, cfg, num_graph_samples=20, out_path=out)
        assert demo["pos"].shape[0] == 3                  # init + 2 folds
        assert demo["graph"].shape == (3, 20, 3)
        assert demo["edge_index"].shape[0] == 2
        assert demo["actions"].shape == (2, 6)
        # folding reduces coverage
        assert demo["coverage"][-1] < demo["coverage"][0]

        loaded = load_demo(out)
        assert set(loaded) == set(demo)

        env2 = ClothEnv(nx=8, ny=8, seed=1)
        result = imitate_demo(loaded, env2, n_steps=6)
        assert result["coverage_ratio"] == pytest.approx(1.0, abs=0.6)
        assert result["graph_error"] is not None
        assert result["graph_error"] < 0.3
