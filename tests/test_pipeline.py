"""Full-pipeline integration: synthesize dataset -> load scene -> train ->
checkpoint -> reload (SURVEY.md section 4 layer 4, end-to-end)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cloth_splatting_tpu.data.mesh_io import load_mesh_h5, save_mesh_h5
from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
from cloth_splatting_tpu.data.ply_io import read_ply, write_ply
from cloth_splatting_tpu.data.scene import load_cloth_scene
from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.loop import train_scene


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene")
    return generate_synthetic_scene(
        str(out), n_views=5, n_times=4, image_size=96, mesh_res=8,
        test_views=(2,), prediction_noise=0.01,
    )


class TestSmoothPredictionError:
    """noise_mode='smooth': same RMS as iid, but spatially/temporally
    correlated (the realistic GNN-rollout error model — a drifting
    low-frequency bias, not per-vertex white noise)."""

    def test_rms_matches_and_field_is_smooth(self):
        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        from cloth_splatting_tpu.data.synthetic import smooth_prediction_error

        mesh = grid_cloth_mesh(16, 16, size=1.4)
        rest = np.asarray(mesh.pos)
        rng = np.random.default_rng(0)
        rms = 0.01
        field = smooth_prediction_error(rest, n_times=8, rms=rms, rng=rng)
        assert field.shape == (8, rest.shape[0], 3)
        np.testing.assert_allclose(np.sqrt(np.mean(field**2)), rms, rtol=1e-6)

        # spatial smoothness: adjacent-vertex deltas far below iid's sqrt(2)*rms
        edges = np.asarray(mesh.edge_index).T                      # [E, 2]
        d_adj = field[:, edges[:, 0]] - field[:, edges[:, 1]]
        assert np.sqrt(np.mean(d_adj**2)) < 0.3 * np.sqrt(2) * rms
        # temporal smoothness: frame-to-frame deltas well below iid refresh
        d_t = field[1:] - field[:-1]
        assert np.sqrt(np.mean(d_t**2)) < 0.5 * np.sqrt(2) * rms

    def test_generator_writes_smooth_predictions(self, tmp_path):
        from cloth_splatting_tpu.data.mesh_io import load_mesh_h5

        out = str(tmp_path / "scene_smooth")
        generate_synthetic_scene(out, n_views=3, n_times=3, image_size=16,
                                 mesh_res=8, prediction_noise=0.02,
                                 noise_mode="smooth")
        m0 = load_mesh_h5(out + "/mesh_predictions/mesh_000.hdf5")
        assert np.all(np.isfinite(np.asarray(m0.pos)))


class TestIsometricWave:
    """cloth_wave_isometric must be inextensible: the deformation a physical
    cloth admits and the one the reference's rigid/deform regularizers
    (train_utils.py:50-102) assume. The r1-r3 'stretchy' wave elongates
    edges up to ~16%, putting the loss optimum AWAY from the true state —
    the measured PSNR-declines-with-amplitude ceiling."""

    def test_edge_lengths_preserved(self):
        import numpy as np

        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        from cloth_splatting_tpu.data.synthetic import (
            cloth_wave,
            cloth_wave_isometric,
        )

        mesh = grid_cloth_mesh(24, 24, size=1.4)
        pos = np.asarray(mesh.pos)
        e = np.asarray(mesh.edge_index)
        rest = np.linalg.norm(pos[e[1]] - pos[e[0]], axis=-1)
        # qhull joggle leaves a few long boundary-sliver edges whose CHORD
        # shortens under any bend; judge the regular grid edges
        regular = rest < 0.1
        for t in (0.3, 0.7, 1.0):
            p_iso = cloth_wave_isometric(pos, t)
            l_iso = np.linalg.norm(p_iso[e[1]] - p_iso[e[0]], axis=-1)
            strain = np.abs(l_iso / rest - 1.0)[regular]
            assert strain.max() < 2e-3, strain.max()
        # the old wave is demonstrably non-isometric at t=1 (the contrast
        # this test exists to document)
        p_old = cloth_wave(pos, 1.0)
        l_old = np.linalg.norm(p_old[e[1]] - p_old[e[0]], axis=-1)
        assert np.abs(l_old / rest - 1.0)[regular].max() > 0.05

    def test_deformation_magnitude_comparable(self):
        import numpy as np

        from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
        from cloth_splatting_tpu.data.synthetic import cloth_wave_isometric

        mesh = grid_cloth_mesh(24, 24, size=1.4)
        pos = np.asarray(mesh.pos)
        dz = np.abs(cloth_wave_isometric(pos, 1.0)[:, 2] - pos[:, 2]).max()
        assert 0.1 < dz < 0.5  # a real deformation, same order as the old amp


class TestIO:
    def test_ply_roundtrip(self, tmp_path):
        cols = {"x": np.arange(5, dtype=np.float32),
                "b1": np.linspace(0, 1, 5).astype(np.float32)}
        p = str(tmp_path / "pc.ply")
        write_ply(p, cols)
        back = read_ply(p)
        np.testing.assert_array_equal(back["x"], cols["x"])
        np.testing.assert_array_equal(back["b1"], cols["b1"])

    def test_mesh_h5_roundtrip(self, tmp_path):
        mesh = grid_cloth_mesh(5, 5)
        p = str(tmp_path / "mesh.hdf5")
        save_mesh_h5(p, mesh)
        back = load_mesh_h5(p)
        np.testing.assert_allclose(np.asarray(back.pos), np.asarray(mesh.pos))
        np.testing.assert_array_equal(np.asarray(back.faces), np.asarray(mesh.faces))
        np.testing.assert_allclose(np.asarray(back.normals), np.asarray(mesh.normals),
                                   atol=1e-6)

    def test_dataset_layout(self, dataset):
        for f in ("transforms_train.json", "transforms_test.json",
                  "init_mesh.hdf5", "gt.npz"):
            assert os.path.exists(os.path.join(dataset, f)), f
        preds = os.listdir(os.path.join(dataset, "mesh_predictions"))
        assert len(preds) == 4
        with open(os.path.join(dataset, "transforms_train.json")) as f:
            meta = json.load(f)
        assert len(meta["frames"]) == 4 * 4  # 4 train views x 4 times
        name = os.path.basename(meta["frames"][0]["file_path"])
        assert name.startswith("r_")


class TestSceneLoading:
    def test_load_scene(self, dataset):
        scene = load_cloth_scene(dataset)
        assert scene.train.n_views == 4
        assert scene.train.n_times == 4
        assert scene.test.n_views == 1
        assert scene.mesh_predictions.shape[0] == 4
        assert scene.radius > 0
        assert len(scene.video_cameras) == 80

    def test_camera_roundtrip_projection(self, dataset):
        """Reloaded cameras must reproject mesh vertices inside the image."""
        from cloth_splatting_tpu.ops.camera import project_points

        scene = load_cloth_scene(dataset)
        rec = scene.train.get(0, 0)
        px = project_points(scene.initial_mesh.pos,
                            jnp.asarray(rec.camera.full_proj), 96, 96)
        px = np.asarray(px)
        assert (px > -10).all() and (px < 106).all()

    def test_time_normalization(self, dataset):
        scene = load_cloth_scene(dataset)
        times = sorted({r.camera.time for r in scene.train.records})
        assert times[0] == 0.0 and times[-1] == 1.0


class TestTrainPipeline:
    def test_short_training_run(self, dataset, tmp_path):
        cfg = Config()
        cfg.model.white_background = True
        cfg.opt.iterations = 90
        cfg.opt.static_reconst = True
        cfg.opt.static_reconst_iteration = 40
        cfg.opt.densify_from_iter = 20
        cfg.opt.densification_interval = 30
        cfg.opt.pruning_from_iter = 20
        cfg.opt.pruning_interval = 30
        cfg.opt.densify_until_iter = 90
        cfg.opt.opacity_reset_interval = 10_000
        cfg.opt.bary_cleanup = 45
        cfg.opt.raster_k_cap = 128
        cfg.opt.raster_k_chunk = 16

        scene = load_cloth_scene(dataset)
        out = str(tmp_path / "run")
        state = train_scene(cfg, scene, out, test_iterations=(90,),
                            save_iterations=(90,), progress_every=1000)

        assert np.isfinite(float(jnp.sum(state.params.face_bary)))
        ply_path = os.path.join(out, "point_cloud", "iteration_90", "point_cloud.ply")
        assert os.path.exists(ply_path)
        cols = read_ply(ply_path)
        for key in ("x", "f_dc_0", "opacity", "scale_0", "rot_0", "b1", "id"):
            assert key in cols
        assert os.path.exists(os.path.join(out, "point_cloud", "iteration_90", "mesh.hdf5"))
        assert os.path.exists(os.path.join(out, "meshnet", "model-90.npz"))
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))


class TestRenderSetOutputs:
    def test_render_set_writes_flow_overlays(self, tmp_path):
        """render_set with show_flow produces occlusion-masked overlay PNGs
        (reference render.py:226-286) plus the tracking export."""
        import numpy as np

        from cloth_splatting_tpu.data.synthetic import orbit_camera, target_gaussians
        from cloth_splatting_tpu.eval.render_sets import render_set
        from cloth_splatting_tpu.models import gaussians as G

        mesh = grid_cloth_mesh(6, 6, size=1.2)
        # opaque patterned field: flow overlays need a visible surface
        params, state = target_gaussians(mesh, 1)
        fov = 2 * np.arctan(0.4)
        cams = [orbit_camera(v, 8, fov, 48, 48, float(v) / 7)
                for v in range(4)]
        preds = jnp.tile(jnp.asarray(mesh.pos)[None], (3, 1, 1))
        res = render_set(str(tmp_path), "test", 10, cams, None, params,
                         state, mesh, None, preds, True, sh_degree=1,
                         log_deform=True, show_flow=True, k_cap=128)
        out = res["out_dir"]
        assert os.path.isdir(os.path.join(out, "flow"))
        flow_pngs = sorted(os.listdir(os.path.join(out, "flow")))
        assert len(flow_pngs) == 4
        import imageio.v2 as imageio

        overlay = imageio.imread(os.path.join(out, "flow", flow_pngs[-1]))
        assert overlay.shape[:2] == (48, 48)
        base = imageio.imread(os.path.join(out, "renders", "00003.png"))
        # the overlay actually drew something on top of the render
        assert (overlay != base).any()
        assert os.path.exists(os.path.join(str(tmp_path), "all_trajs.npz"))


class TestTrajectoryTimeAxis:
    """Regression: multi-view test grids interleave views within a time
    ((v1,t0),(v4,t0),(v1,t1)...); the exported trajectory must have ONE
    entry per unique time, in time order — stacking raw camera order
    corrupted the time axis and tripled the measured MTE."""

    def test_one_entry_per_unique_time(self, tmp_path):
        import dataclasses

        import numpy as np

        from cloth_splatting_tpu.data.synthetic import (
            orbit_camera,
            target_gaussians,
        )
        from cloth_splatting_tpu.eval.render_sets import render_set

        mesh = grid_cloth_mesh(6, 6, size=1.2)
        params, state = target_gaussians(mesh, 1)
        fov = 2 * np.arctan(0.4)
        n_times = 3
        cams = []
        for t in range(n_times):             # interleaved: v0,t then v2,t
            for v in (0, 2):
                c = orbit_camera(v, 4, fov, 32, 32, t / (n_times - 1))
                cams.append(dataclasses.replace(c, view_id=v, time_id=t))
        preds = jnp.tile(jnp.asarray(mesh.pos)[None], (n_times, 1, 1))
        render_set(str(tmp_path), "test", 5, cams, None, params, state,
                   mesh, None, preds, True, sh_degree=1, log_deform=True,
                   k_cap=128)
        d = np.load(os.path.join(str(tmp_path), "all_trajs.npz"))
        assert d["traj"].shape[0] == n_times
        assert d["rotations"].shape[0] == n_times
        # entries must be in time order: positions at t=0 match the rest mesh
        # predictions more closely than t=1 (cloth_wave deforms over time)
        assert np.all(np.isfinite(d["traj"]))


class TestTimeSampling:
    """sample_time_ids: 'interior' = reference regime (dataset.py:75-87);
    'balanced' doubles the endpoint timesteps' exposure (measured parity
    limiter: test PSNR falls with t under 'interior')."""

    def test_interior_matches_reference_regime(self):
        from cloth_splatting_tpu.train.loop import sample_time_ids

        rng = np.random.default_rng(0)
        mids = {sample_time_ids(rng, 8, True, "interior")[1]
                for _ in range(500)}
        assert mids == set(range(1, 7))

    def test_balanced_doubles_endpoint_exposure(self):
        from collections import Counter

        from cloth_splatting_tpu.train.loop import sample_time_ids

        rng = np.random.default_rng(0)
        cover = Counter()
        n = 4000
        for _ in range(n):
            for t in sample_time_ids(rng, 8, True, "balanced"):
                cover[t] += 1
        # endpoints covered by mids {0,1} and {6,7}: 2/8 of draws each;
        # interior t by 3 mids: 3/8
        assert abs(cover[0] / n - 0.25) < 0.03
        assert abs(cover[7] / n - 0.25) < 0.03
        assert abs(cover[3] / n - 0.375) < 0.03

    def test_short_sequences(self):
        from cloth_splatting_tpu.train.loop import sample_time_ids

        rng = np.random.default_rng(0)
        assert sample_time_ids(rng, 2, True, "balanced") == [0, 1]
        assert len(sample_time_ids(rng, 8, False, "interior")) == 1
