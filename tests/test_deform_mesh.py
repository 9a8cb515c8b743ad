"""Randomized deformed-mesh generation tests (reference
manipulation/deform_mesh.py:218-425)."""

import json
import os

import numpy as np
import pytest

from cloth_splatting_tpu.manipulation.deform_mesh import (
    ARTFDeformationConfig,
    ClothFunnelsDeformationConfig,
    camera_rig,
    deform_mesh,
    grid_keypoints,
    load_obj,
    render_point_splat,
    write_obj,
)


class TestObjIO:
    def test_roundtrip(self, tmp_path):
        verts = np.random.default_rng(0).normal(size=(9, 3)).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        path = str(tmp_path / "m.obj")
        write_obj(path, verts, faces)
        v2, f2 = load_obj(path)
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)


class TestPointSplat:
    def test_depth_and_rgb_cover_cloth(self):
        rig = camera_rig(size=64)
        pts = np.stack(np.meshgrid(np.linspace(-0.1, 0.1, 10),
                                   np.linspace(-0.1, 0.1, 10)),
                       axis=-1).reshape(-1, 2)
        pos = np.concatenate([pts[:, :1], np.zeros((100, 1)), pts[:, 1:]], axis=1)
        rgb, depth = render_point_splat(pos, rig["camera_0"])
        assert rgb.shape == (64, 64, 3) and depth.shape == (64, 64)
        assert (depth > 0).sum() > 20   # cloth visible from the top camera
        assert rgb.max() > 0.5


class TestDeformMesh:
    def test_artf_sample_exports(self, tmp_path):
        cfg = ARTFDeformationConfig(max_fold_distance=0.2)
        out = str(tmp_path / "s0")
        result = deform_mesh(cfg, None, out, rng=np.random.default_rng(0),
                             nx=8, ny=8, fold_steps=6, image_size=32)
        hist = result["particles"]
        assert hist.ndim == 3 and hist.shape[1] == 64
        assert np.all(np.isfinite(hist))
        # the fold moved the cloth
        assert np.abs(hist[-1] - hist[0]).max() > 0.01
        # exports exist
        objs = sorted(os.listdir(os.path.join(out, "meshes")))
        assert len(objs) == hist.shape[0]
        with open(os.path.join(out, "cam_params", "camera_params.json")) as f:
            rig = json.load(f)
        assert set(rig) == {"camera_0", "camera_1"}
        h5 = os.path.join(out, "images", "cloth_observations.h5")
        assert os.path.exists(h5)
        import h5py
        with h5py.File(h5) as hf:
            assert "particles" in hf and "camera_0_rgb" in hf
            assert hf["particles"].shape == hist.shape

    def test_clothfunnels_drag(self, tmp_path):
        cfg = ClothFunnelsDeformationConfig(max_distance=0.2, max_height=0.1)
        out = str(tmp_path / "s1")
        result = deform_mesh(cfg, None, out, rng=np.random.default_rng(1),
                             nx=8, ny=8, fold_steps=6, image_size=32)
        assert np.all(np.isfinite(result["particles"]))

    def test_keypoints_cover_grid(self):
        kp = grid_keypoints(8, 8)
        assert len(kp) == 9
        assert all(0 <= v < 64 for v in kp.values())
        assert kp["corner_00"] == 0 and kp["corner_11"] == 63


class TestExternalObj:
    def test_obj_topology_is_simulated_and_exported(self, tmp_path):
        """Regression: an external .obj must be simulated with its OWN
        vertices/faces, and exports must index only its vertices."""
        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        mesh = grid_cloth_mesh(6, 6, size=0.3)
        src = str(tmp_path / "cloth.obj")
        verts = np.asarray(mesh.pos)
        verts = verts - verts.mean(0) + np.array([0, 0.1, 0])
        write_obj(src, verts, np.asarray(mesh.faces))

        cfg = ARTFDeformationConfig(max_fold_distance=0.15)
        out = str(tmp_path / "s")
        result = deform_mesh(cfg, src, out, rng=np.random.default_rng(0),
                             fold_steps=4, image_size=16)
        hist = result["particles"]
        assert hist.shape[1] == 36                      # the obj's vertices
        assert np.all(np.isfinite(hist))
        v2, f2 = load_obj(os.path.join(out, "meshes", "000000.obj"))
        assert v2.shape[0] == 36
        assert f2.max() < 36
