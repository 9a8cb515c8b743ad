"""Synthetic cloth-scene generator.

Produces datasets in the exact on-disk format the reference consumes
(SURVEY.md section 2.2 Scene loading): ``transforms_{train,test}.json`` with
``r_<view>_<time>`` frames, ``init_mesh.hdf5``, ``mesh_predictions/
mesh_%03d.hdf5`` and a ground-truth trajectory ``gt.npz`` — but rendered with
OUR splat renderer instead of Blender (SURVEY.md section 2.1, Blender row:
dataset generation is not TPU work; for CI we synthesize with the framework's
own renderer).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cloth_splatting_tpu.data.mesh_io import save_mesh_h5, save_positions_h5
from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.ops.camera import Camera
from cloth_splatting_tpu.ops.image import inverse_sigmoid
from cloth_splatting_tpu.ops.sh import rgb_to_sh
from cloth_splatting_tpu.render import camera_arrays, render


def cloth_wave(pos: np.ndarray, t: float, amp: float = 0.15) -> np.ndarray:
    """Analytic cloth deformation: a traveling wave + drift in z.

    NOTE: pure-z displacement STRETCHES the sheet (locally up to ~17% edge
    elongation at t=1) — real cloth is inextensible, and the reference's
    rigid/deform-mag regularizers assume so. Kept for continuity with the
    round-1..3 parity numbers; ``cloth_wave_isometric`` is the physically
    honest default for parity work."""
    x, y = pos[:, 0], pos[:, 1]
    z = pos[:, 2] + amp * np.sin(4.0 * x + 6.0 * t) * np.cos(3.0 * y) * t
    out = pos.copy()
    out[:, 2] = z
    out[:, 1] = y + 0.1 * t
    return out


def cloth_wave_isometric(pos: np.ndarray, t: float,
                         amp: float = 0.6) -> np.ndarray:
    """Inextensible traveling wave: a developable (cylindrical) bend.

    The sheet's x-lines follow a planar curve given by its tangent angle
    theta(s) = amp * t * sin(4 s + 6 t), integrated as X' = cos(theta),
    Z' = sin(theta) over material coordinate s — arc length is preserved
    EXACTLY by construction (|curve'| = 1), y-lines ride rigidly, so every
    edge keeps its rest length: the deformation a physical cloth (and the
    reference's rigidity regularizers, train_utils.py:50-102) actually
    admits. ``amp`` is the peak bend angle in radians (0.6 rad gives z
    excursions comparable to cloth_wave's 0.15 units). Plus the same 0.1*t
    y-drift (rigid)."""
    x, y = pos[:, 0], pos[:, 1]
    # fine material grid covering the sheet, one tangent-angle integral per t
    s = np.linspace(x.min() - 1e-6, x.max() + 1e-6, 4097)
    theta = amp * t * np.sin(4.0 * s + 6.0 * t)
    ds = s[1] - s[0]
    # trapezoid cumulative integrals of (cos, sin) theta
    cx = np.concatenate([[0.0], np.cumsum(
        0.5 * (np.cos(theta[1:]) + np.cos(theta[:-1])) * ds)])
    cz = np.concatenate([[0.0], np.cumsum(
        0.5 * (np.sin(theta[1:]) + np.sin(theta[:-1])) * ds)])
    big_x = s[0] + cx
    # keep the sheet centered: remove the mean in-plane shrink drift
    big_x = big_x - (big_x.mean() - s.mean())
    out = pos.copy()
    out[:, 0] = np.interp(x, s, big_x)
    out[:, 2] = pos[:, 2] + np.interp(x, s, cz)
    out[:, 1] = y + 0.1 * t
    return out


WAVES = {"stretchy": cloth_wave, "isometric": cloth_wave_isometric}


def orbit_camera(view: int, n_views: int, fov: float, width: int, height: int,
                 time: float, radius: float = 3.0, elevation: float = 0.6
                 ) -> Camera:
    ang = 2.0 * np.pi * view / n_views
    cam_pos = np.asarray([
        radius * np.cos(elevation) * np.sin(ang),
        radius * np.sin(elevation),
        -radius * np.cos(elevation) * np.cos(ang),
    ])
    fwd = -cam_pos / np.linalg.norm(cam_pos)
    up = np.asarray([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right = right / np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    r_w2c = np.stack([right, up2, fwd], axis=0)
    t = -r_w2c @ cam_pos
    return Camera.create(R=r_w2c.T, t=t, fovx=fov, fovy=fov, width=width,
                         height=height, time=time)


def camera_to_transform_matrix(cam: Camera) -> np.ndarray:
    """Invert the loader's convention back to an OpenGL c2w for the json."""
    w2c = np.asarray(cam.world_view).T.copy()   # column-vector W2C
    c2w = np.linalg.inv(w2c)
    c2w[:3, 1:3] *= -1
    return c2w


def target_gaussians(mesh, sh_degree: int, seed: int = 0):
    """A textured 'ground truth' Gaussian field anchored on the mesh."""
    rng = np.random.default_rng(seed)
    params, state = G.init_from_mesh(rng, mesh, sh_degree, 2,
                                     capacity=G.round_capacity(2 * int(mesh.faces.shape[0])))
    xyz = G.gaussian_positions(params, state, mesh)
    colors = jnp.stack([
        0.55 + 0.4 * jnp.sin(6.0 * xyz[:, 0]) * jnp.cos(4.0 * xyz[:, 1]),
        0.5 + 0.35 * jnp.cos(8.0 * xyz[:, 0]),
        0.45 + 0.3 * jnp.sin(5.0 * xyz[:, 1]),
    ], axis=1)
    params = params._replace(
        features_dc=rgb_to_sh(jnp.clip(colors, 0.05, 0.95))[:, None, :],
        opacity=jnp.full_like(params.opacity, inverse_sigmoid(jnp.asarray(0.95))),
        scaling=params.scaling + 0.2,
    )
    return params, state


def smooth_prediction_error(rest: np.ndarray, n_times: int, rms: float,
                            rng: np.random.Generator,
                            n_centers: int = 4,
                            length_scale: float = 0.5) -> np.ndarray:
    """Spatially/temporally smooth error field, RMS-normalized to ``rms``.

    A trained GNN's rollout error is low-frequency and correlated across
    vertices and time (a drifting bias), not white noise: iid per-vertex
    perturbation of the driving mesh makes face frames jitter and gives
    mesh-bound Gaussians inconsistent supervision each step — far harsher
    than any real rollout at the same RMS. Model the realistic case as a
    sum of RBF bumps with temporally-smoothed coefficients.
    Returns [T, V, 3]."""
    centers = rest[rng.choice(rest.shape[0], size=n_centers, replace=False)]
    d2 = ((rest[:, None, :] - centers[None, :, :]) ** 2).sum(-1)   # [V, M]
    basis = np.exp(-d2 / (2.0 * length_scale**2))                  # [V, M]
    coef = rng.normal(size=(n_times, n_centers, 3))                # [T, M, 3]
    if n_times > 2:   # temporal smoothing: 1-2-1 passes along time
        for _ in range(2):
            pad = np.concatenate([coef[:1], coef, coef[-1:]])
            coef = 0.25 * pad[:-2] + 0.5 * pad[1:-1] + 0.25 * pad[2:]
    field = np.einsum("vm,tmc->tvc", basis, coef)                  # [T, V, 3]
    scale = rms / max(np.sqrt(np.mean(field**2)), 1e-12)
    return field * scale


def generate_synthetic_scene(
    out_dir: str,
    n_views: int = 6,
    n_times: int = 5,
    image_size: int = 128,
    mesh_res: int = 10,
    fov: float = 2 * np.arctan(0.4),
    white_background: bool = True,
    test_views: tuple[int, ...] = (1, 4),
    prediction_noise: float = 0.0,
    noise_mode: str = "iid",
    seed: int = 0,
    wave: str = "stretchy",
) -> str:
    """Render a full synthetic dataset; returns out_dir.

    ``prediction_noise`` perturbs the saved mesh_predictions relative to the
    true trajectory, emulating imperfect GNN rollouts (the setting train.py's
    residual simulator exists to fix). ``noise_mode='iid'`` is per-vertex
    white noise (an adversarial worst case); ``'smooth'`` is a spatially and
    temporally correlated field at the same RMS (how real rollouts err).

    ``wave`` selects the deformation family: 'stretchy' (the r1-r3 pure-z
    wave, which elongates edges — a motion no physical cloth performs and
    one the reference's rigidity regularizers rightly fight) or 'isometric'
    (an inextensible developable bend; the honest parity task).
    """
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    rest_mesh = grid_cloth_mesh(mesh_res, mesh_res, size=1.4)
    params, state = target_gaussians(rest_mesh, sh_degree=3, seed=seed)
    rng = np.random.default_rng(seed + 1)

    rest = np.asarray(rest_mesh.pos)
    times = np.linspace(0.0, 1.0, n_times)
    wave_fn = WAVES[wave]
    traj = np.stack([wave_fn(rest, t) for t in times])              # [T, V, 3]

    # meshes on disk
    save_mesh_h5(os.path.join(out_dir, "init_mesh.hdf5"), rest_mesh)
    if prediction_noise > 0 and noise_mode == "smooth":
        err = smooth_prediction_error(rest, n_times, prediction_noise, rng)
    elif prediction_noise > 0:
        err = rng.normal(0, prediction_noise, (n_times,) + rest.shape)
    else:
        err = np.zeros((n_times,) + rest.shape)
    for i, t in enumerate(times):
        pred = traj[i] + err[i]
        save_positions_h5(os.path.join(out_dir, "mesh_predictions", f"mesh_{i:03d}.hdf5"),
                          rest_mesh, pred.astype(np.float32))

    # gaussian ground-truth trajectory for tracking eval
    xyz_t = np.stack([
        np.asarray(G.gaussian_positions(params, state, rest_mesh, jnp.asarray(traj[i])))
        [np.asarray(state.alive)]
        for i in range(n_times)
    ])
    np.savez(os.path.join(out_dir, "gt.npz"), traj=xyz_t)

    # Straight (non-premultiplied) RGBA, the NeRF-synthetic/Blender
    # convention the loader expects: render on BLACK to get the
    # premultiplied foreground P = sum(c a T), store P/alpha + alpha so
    # decode_image's composite  (P/alpha)*alpha + (1-alpha)*bg  reproduces
    # the true bg composite exactly (up to uint8). Storing an
    # already-composited RGB here double-composites at every
    # semi-transparent pixel and caps achievable PSNR at ~37 dB — measured
    # by scripts/parity_diag.py rendering the TRUE parameters.
    cam0 = orbit_camera(0, n_views, fov, image_size, image_size, 0.0)
    black = jnp.zeros(3)
    # GT must go through the SAME rasterizer tier the pipeline evaluates
    # (and trains) through, or the metric saturates on tier semantics
    # instead of fit quality: identical parameters scored 64.5 dB through
    # the dense tiled tier but 49.4 dB through the Pallas serving tier
    # (CUDA-contract T<1e-4 early exit) against tiled-made GT (r04a
    # parity_diag; VERDICT r4 weak #6). eval/render_sets.py picks
    # pallas_fwd off-CPU — mirror that selection exactly here.
    use_pallas = jax.default_backend() != "cpu"

    @jax.jit
    def render_time(cam_bank, verts):
        # all views of one timestep as ONE program + ONE uint8 fetch: the
        # TPU tunnel costs ~25 ms/dispatch and ~0.5 s per f32 frame download
        def one(cam_arr):
            out = render(cam_arr, image_size, image_size, cam0.tanfovx,
                         cam0.tanfovy, params, state, rest_mesh, None, None,
                         black, 3, render_static=True,
                         override_vertices=verts, k_cap=256, k_chunk=16,
                         backend="pallas_fwd" if use_pallas else "tiled",
                         bg_static=(0.0, 0.0, 0.0))
            prem = jnp.clip(out.rgb, 0, 1)
            alpha_f = jnp.clip(out.alpha[0], 0, 1)
            straight = jnp.clip(prem / jnp.maximum(alpha_f, 1e-4)[None], 0, 1)
            rgba = jnp.concatenate([straight, alpha_f[None]], axis=0)
            return jnp.round(rgba * 255).astype(jnp.uint8)     # [4, H, W]

        return jax.lax.map(one, cam_bank)

    cams_by_time = [
        [orbit_camera(vi, n_views, fov, image_size, image_size, float(t))
         for vi in range(n_views)]
        for t in times
    ]
    frames_train, frames_test = [], []
    for ti, t in enumerate(times):
        verts = jnp.asarray(traj[ti])
        arrs = [camera_arrays(c) for c in cams_by_time[ti]]
        from cloth_splatting_tpu.render import CameraArrays
        bank = CameraArrays(*[jnp.stack([getattr(a, f) for a in arrs])
                              for f in CameraArrays._fields])
        rgba_all = np.asarray(render_time(bank, verts))        # [V, 4, H, W]
        for vi in range(n_views):
            cam = cams_by_time[ti][vi]
            rgba = rgba_all[vi].transpose(1, 2, 0)             # [H, W, 4]
            split = "test" if vi in test_views else "train"
            sub = os.path.join(out_dir, split)
            os.makedirs(sub, exist_ok=True)
            name = f"r_{vi}_{ti}"
            imageio.imwrite(os.path.join(sub, name + ".png"), rgba)
            frame = {
                "file_path": f"{split}/{name}",
                "time": float(t),
                "transform_matrix": camera_to_transform_matrix(cam).tolist(),
            }
            (frames_test if vi in test_views else frames_train).append(frame)

    for split, frames in (("train", frames_train), ("test", frames_test)):
        meta = {
            "camera_angle_x": float(fov),
            "camera_angle_y": float(fov),
            "frames": frames,
        }
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return out_dir
