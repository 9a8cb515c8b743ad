# MD-Splatting final_scenes configuration (reference arguments/
# mdnerf-dataset/cube.py role): the ablation/benchmark scenes
# (final_scene_1..7) trained without the static stage.

OptimizationParams = dict(
    mesh_type="multi",
    densification_interval=100,
    densify_from_iter=500,
    densify_until_iter=15_000,
    opacity_reset_interval=3000,
    pruning_from_iter=500,
    pruning_interval=100,
    percent_dense=0.01,
    gaussian_init_factor=2,
    no_coarse=True,
    white_background=True,
    iterations=20_000,
    static_reconst=False,
)

ModelParams = dict(sh_degree=3)
