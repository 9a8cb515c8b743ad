"""Configuration system.

One dataclass per reference param group, replicating the reference's NAMES and
DEFAULTS exactly (reference: arguments/__init__.py:51-173) because the run
scripts and saved ``cfg_args`` depend on them, with the reference's
python-file overlay semantics (``--configs arguments/cloth_splatting/*.py``
files that define ``OptimizationParams = dict(...)`` etc., merged over the
defaults — reference: utils/params_utils.py:1-8 + train.py:422-427).

Unlike the reference's three coexisting systems (argparse auto-gen, mmcv
configs, absl flags) everything funnels into these dataclasses.
"""

from __future__ import annotations

import dataclasses
import runpy
from typing import Any


@dataclasses.dataclass
class ModelConfig:
    """Reference ModelParams (arguments/__init__.py:51-67)."""

    sh_degree: int = 3
    # deformation model refining the GNN mesh predictions: 'mlp' = the
    # sinusoidal-time residual MLP (reference ResidualMeshSimulator,
    # meshnet_network.py:325-380, the train.py default); 'embedding' = the
    # per-timestep residual table variant (ResidualMeshSimulatorEmbedding,
    # meshnet_network.py:382-411)
    simulator: str = "mlp"
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = True
    data_device: str = "tpu"
    eval: bool = True
    render_process: bool = False


@dataclasses.dataclass
class PipelineConfig:
    """Reference PipelineParams (arguments/__init__.py:70-75)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass
class OptimizationConfig:
    """Reference OptimizationParams (arguments/__init__.py:109-159)."""

    dataloader: bool = False
    iterations: int = 8_000
    coarse_iterations: int = 3000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 20_000
    position_lr_static: float = 0.0016  # present in scene configs; unused (parity)
    deformation_lr_init: float = 0.00016
    deformation_lr_final: float = 0.000016
    deformation_lr_delay_mult: float = 0.01
    grid_lr_init: float = 0.0016
    grid_lr_final: float = 0.00016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    # Tail decay over ALL Gaussian param groups (new capability, disabled by
    # default for reference parity: 3DGS decays only the position LR). Adam
    # normalizes gradient magnitude, so near an optimum the quantization-
    # noise gradient still produces full lr-sized parameter steps; the
    # stationary jitter is set by the CONSTANT group LRs (opacity 0.05,
    # scaling 0.005) and costs PSNR that grows with resolution. A cosine
    # ramp from lr_tail_start * iterations down to lr_tail_floor * lr lets
    # the fit settle into the basin it found. Measured on the 800px parity
    # scene: from-truth equilibrium 43 dB at constant LRs.
    lr_tail_start: float = 1.0   # fraction of total iterations; 1.0 = off
    lr_tail_floor: float = 0.01  # final LR multiplier at the last iteration
    # 3-step window placement. 'interior' is the reference regime
    # (dataset.py:75-87: mid-time uniform over [1, T-2]), which gives the
    # endpoint timesteps only 1/3 the gradient exposure of interior ones —
    # measured on the 800px parity scene as test PSNR falling from ~30 dB
    # at t=0 to ~24 dB at t=1. 'balanced' draws the mid over [0, T-1] and
    # clamps, doubling endpoint exposure at no cost elsewhere.
    time_sample: str = "interior"
    percent_dense: float = 0.01
    lambda_dssim: float = 0.1
    lambda_lpips: float = 0.0
    lambda_rigid: float = 0.3
    lambda_deform_mag: float = 0.01
    lambda_momentum: float = 0.1
    # Anchor regularizer (TPU-repo extension, default 0 = reference
    # parity): penalizes |deformed - GNN-predicted| vertices. Every
    # reference regularizer is temporal-RELATIVE (frame-to-frame
    # magnitude, edge lengths, momentum), so a time-coherent drift of the
    # whole mesh off the predicted surface is unconstrained except weakly
    # by photometrics — measured at 17.2 mm mean nearest-Gaussian offset
    # on the zero-noise isometric parity run, the dominant term of its
    # 20.2 mm MTE (docs/results/hwq_r05d.json mte_decompose_iso_zn).
    lambda_anchor: float = 0.0
    # MD-Splatting kNN regularizers (reference train.py:396-412 flags +
    # train_utils.py:104-235; drive the published lambda_iso ablation)
    lambda_isometric: float = 0.0
    lambda_spring: float = 0.0
    lambda_rigidity: float = 0.0
    lambda_w: float = 2000.0
    k_nearest: int = 20
    reg_iter: int = 5000
    knn_update_iter: int = 1000
    weight_constraint_init: float = 1.0
    weight_constraint_after: float = 0.2
    weight_decay_iteration: int = 5000
    opacity_reset_interval: int = 3000
    densification_interval: int = 100
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold_coarse: float = 0.0002
    densify_grad_threshold_fine_init: float = 0.0002
    densify_grad_threshold_after: float = 0.0002
    pruning_from_iter: int = 500
    pruning_interval: int = 100
    pruningy_until_iter: int = 4500  # [sic] name kept for config-file compat
    opacity_threshold_coarse: float = 0.005
    opacity_threshold_fine_init: float = 0.005
    opacity_threshold_fine_after: float = 0.005
    static_reconst: bool = False
    static_reconst_iteration: int = 2000
    bary_cleanup: int = 200
    initial_gaussians: int = 2000
    gaussian_init_factor: int = 2
    no_coarse: bool = False
    mesh_type: str = "multi"
    white_background: bool = True  # scene configs set it in this group too
    # TPU-tier knobs (ours)
    raster_k_cap: int = 512
    raster_k_chunk: int = 32
    # "auto": Pallas custom-VJP rasterizer on TPU, dense XLA tier on CPU;
    # "pallas" / "tiled" force one
    raster_backend: str = "auto"
    # Pallas-tier instance ordering: 'fused' single-i32-key sort (CUDA
    # radix-key semantics; see ops/rasterize/pallas_tiled.sorted_pack) or
    # 'exact' lexicographic (tile, f32 depth) two-key sort. Default 'fused':
    # the r05a on-chip A/B wins both arms — serving 120.9 vs 118.2 FPS,
    # train 13.61 vs 13.52 it/s @ 24k (docs/results/hwq_r05a.json).
    raster_pack_order: str = "fused"
    # Polyak/EMA evaluation (new capability, off by default for reference
    # parity). Adam's normalized update is ~LR-sized even at an optimum, so
    # the iterate never settles: the r4 truth probes measure a from-exact-GT
    # fit wandering a 44-49 dB band under constant group LRs. With
    # param_ema = d > 0 (e.g. 0.995), evals/checkpoints use an exponential
    # moving average of (gaussian, simulator) params — the basin center
    # instead of one jittered sample — while the optimizer itself is
    # untouched. The EMA resets on density-control/cleanup events (slot
    # contents change identity); training-resume checkpoints keep RAW
    # params. Ignored by the scene-parallel sweep driver.
    param_ema: float = 0.0


@dataclasses.dataclass
class MeshnetConfig:
    """Reference MeshnetParams (arguments/__init__.py:162-173)."""

    meshnet_path: str = ""
    meshnet_file: str = "latest"
    lr_init: float = 3e-4
    lr_decay_rate: float = 0.1
    lr_decay_steps: float = 5e6


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    opt: OptimizationConfig = dataclasses.field(default_factory=OptimizationConfig)
    meshnet: MeshnetConfig = dataclasses.field(default_factory=MeshnetConfig)


_GROUP_MAP = {
    "ModelParams": "model",
    "PipelineParams": "pipeline",
    "OptimizationParams": "opt",
    "MeshnetParams": "meshnet",
    "ModelHiddenParams": None,  # k-planes config: vestigial in the reference
}


def apply_overrides(cfg: Config, group_dicts: dict[str, dict[str, Any]]) -> Config:
    """Merge ``{'OptimizationParams': {...}, ...}`` dicts over the defaults."""
    for group_name, values in group_dicts.items():
        attr = _GROUP_MAP.get(group_name, group_name)
        if attr is None:
            continue
        if not hasattr(cfg, attr):
            raise KeyError(f"Unknown config group: {group_name}")
        group = getattr(cfg, attr)
        for key, value in values.items():
            if hasattr(group, key):
                setattr(group, key, value)
            # unknown keys are ignored, matching merge_hparams behavior
    return cfg


def load_config_file(cfg: Config, path: str) -> Config:
    """Overlay a reference-style python config file (e.g.
    arguments/cloth_splatting/default.py)."""
    ns = runpy.run_path(path)
    groups = {k: v for k, v in ns.items() if k in _GROUP_MAP and isinstance(v, dict)}
    return apply_overrides(cfg, groups)
