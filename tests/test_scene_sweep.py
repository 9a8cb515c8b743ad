"""Scene-parallel sweep tests (SURVEY section 2.3 axis (d), VERDICT r2
item 6): grouped same-signature scenes train one-per-device and must match
the sequential train_scene baseline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.train.config import Config

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
]


def _make_scenes(tmp_path, n=2, image_size=32, mesh_res=4, n_views=3,
                 n_times=3):
    from cloth_splatting_tpu.data.scene import load_cloth_scene
    from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene

    scenes, dirs = [], []
    for s in range(n):
        d = str(tmp_path / f"scene_{s}")
        generate_synthetic_scene(d, n_views=n_views, n_times=n_times,
                                 image_size=image_size, mesh_res=mesh_res,
                                 prediction_noise=0.0, seed=100 + s)
        dirs.append(d)
        scenes.append(load_cloth_scene(d))
    return scenes, dirs


def _cfg(iterations=40):
    cfg = Config()
    cfg.model.white_background = True
    cfg.opt.iterations = iterations
    cfg.opt.static_reconst = True
    cfg.opt.static_reconst_iteration = 15
    cfg.opt.densify_from_iter = 5
    cfg.opt.densification_interval = 20
    cfg.opt.pruning_from_iter = 5
    cfg.opt.pruning_interval = 20
    cfg.opt.densify_until_iter = iterations
    cfg.opt.opacity_reset_interval = 10_000
    cfg.opt.bary_cleanup = 25
    cfg.opt.raster_k_cap = 128
    cfg.opt.raster_k_chunk = 16
    return cfg


class TestGrouping:
    def test_same_signature_scenes_group(self, tmp_path):
        from cloth_splatting_tpu.parallel.sweep import group_scenes, scene_signature

        scenes, _ = _make_scenes(tmp_path, n=2)
        assert scene_signature(scenes[0]) == scene_signature(scenes[1])
        assert group_scenes(scenes) == [[0, 1]]

    def test_different_shapes_split(self, tmp_path):
        from cloth_splatting_tpu.data.scene import load_cloth_scene
        from cloth_splatting_tpu.data.synthetic import generate_synthetic_scene
        from cloth_splatting_tpu.parallel.sweep import group_scenes

        scenes, _ = _make_scenes(tmp_path, n=1)
        d = str(tmp_path / "other")
        generate_synthetic_scene(d, n_views=3, n_times=3, image_size=32,
                                 mesh_res=6, prediction_noise=0.0)
        scenes.append(load_cloth_scene(d))
        assert group_scenes(scenes) == [[0], [1]]


class TestSweepMatchesSequential:
    def test_group_matches_sequential(self, tmp_path):
        from cloth_splatting_tpu.ops.image import psnr as psnr_fn
        from cloth_splatting_tpu.parallel.sweep import train_scenes_parallel
        from cloth_splatting_tpu.render import camera_arrays, render
        from cloth_splatting_tpu.train.loop import train_scene

        scenes, _ = _make_scenes(tmp_path, n=2)
        cfg = _cfg()

        seq = [train_scene(cfg, sc, str(tmp_path / f"seq_{i}"),
                           progress_every=1000, seed=7)
               for i, sc in enumerate(scenes)]

        par_dirs = [str(tmp_path / f"par_{i}") for i in range(2)]
        par = train_scenes_parallel(cfg, scenes, par_dirs, seed=7,
                                    save_iterations=(40,),
                                    progress_every=1000)

        for i, sc in enumerate(scenes):
            cam = sc.train.get(0, 0).camera

            def img(st):
                st = jax.device_get(st)
                out = render(
                    camera_arrays(cam), cam.width, cam.height, cam.tanfovx,
                    cam.tanfovy, st.params, st.gstate, sc.initial_mesh,
                    st.sim_params, jnp.asarray(sc.mesh_predictions),
                    jnp.ones((3,), jnp.float32), 0, k_cap=128, k_chunk=16)
                return jnp.clip(out.rgb, 0, 1)

            # equivalence: both drivers consume identical init + sampling +
            # densify RNG streams (dedicated [seed, 1] sampling generator).
            # Bit-equality is NOT attainable — shard_map compiles a
            # different program, whose fp reassociation drifts ~1e-4 over
            # 40 iters and can flip individual densify-threshold
            # comparisons — so the pin is: same schedule (step counts),
            # same population (alive counts), same fit (the cross-PSNR bar
            # sits far above the 30 dB that fully-divergent draws gave,
            # and the median param delta is at fp-drift scale).
            assert int(par[i].step) == int(seq[i].step)
            n_par = int(jnp.sum(par[i].gstate.alive))
            n_seq = int(jnp.sum(seq[i].gstate.alive))
            assert abs(n_par - n_seq) <= max(2, n_seq // 50), (n_par, n_seq)
            med = float(jnp.median(jnp.abs(
                par[i].params.face_bary - seq[i].params.face_bary)))
            assert med < 1e-3, med
            cross = float(psnr_fn(img(par[i]), img(seq[i])))
            assert cross > 45.0, f"scene {i}: sweep vs sequential {cross:.2f} dB"
            # sweep wrote the reference-layout checkpoint
            assert os.path.exists(os.path.join(
                par_dirs[i], "point_cloud", "iteration_40",
                "point_cloud.ply"))

    def test_scene_independence(self, tmp_path):
        """Different scenes in one group produce different states."""
        from cloth_splatting_tpu.parallel.sweep import train_scenes_parallel

        scenes, _ = _make_scenes(tmp_path, n=2)
        cfg = _cfg(iterations=10)
        cfg.opt.static_reconst_iteration = 5
        par = train_scenes_parallel(
            cfg, scenes, [str(tmp_path / f"o_{i}") for i in range(2)],
            seed=7, progress_every=1000)
        a = np.asarray(par[0].params.features_dc)
        b = np.asarray(par[1].params.features_dc)
        assert not np.allclose(a, b)


class TestSweepCLI:
    def test_train_scenes_cli(self, tmp_path):
        import train_scenes

        _, dirs = _make_scenes(tmp_path, n=2)
        out_root = str(tmp_path / "out")
        train_scenes.main([
            "--scenes", *dirs, "--out_root", out_root,
            "--iterations", "8", "--static_reconst",
            "--static_reconst_iteration", "4",
            "--save_iterations", "8", "--test_iterations", "8",
            "--raster_k_cap", "128", "--quiet"])
        for d in dirs:
            name = os.path.basename(d)
            assert os.path.exists(os.path.join(out_root, name, "cfg_args"))
            assert os.path.exists(os.path.join(
                out_root, name, "point_cloud", "iteration_8",
                "point_cloud.ply"))
