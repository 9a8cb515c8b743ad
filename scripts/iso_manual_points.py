#!/usr/bin/env python
"""Published isometry-ablation numbers of the reference implementation
(data table; reference scripts/iso_psnr_manual_points.py:13-21 and
scripts/iso_mte_manual_points.py:13-21 — the CoRL'24 paper's final_scenes
results on A100, recorded in BASELINE.md). Used by iso_ablation_plots.py
--with_reference to overlay the CUDA baseline curves."""

# scene order: scene_1, scene_2, scene_3, scene_7, scene_5, scene_6
SCENES = ["scene_1", "scene_2", "scene_3", "scene_7", "scene_5", "scene_6"]

PSNR_DB = {
    0.01: [40.67, 39.62, 43.27, 42.61, 33.46, 34.96],
    1.0: [38.76, 38.16, 40.34, 40.61, 32.47, 32.39],
}

MTE_MM = {
    0.01: [5.173, 63.894, 81.917, 9.449, 5.679, 3.385],
    1.0: [2.881, 46.257, 88.169, 9.686, 4.741, 3.175],
}


def reference_points(metric: str) -> dict:
    """{'scene_1': {0.01: v, 1.0: v}, ...} for metric in {'psnr', 'mte'}."""
    table = PSNR_DB if metric == "psnr" else MTE_MM
    return {scene: {lam: vals[i] for lam, vals in table.items()}
            for i, scene in enumerate(SCENES)}


if __name__ == "__main__":
    import json

    print(json.dumps({"psnr_db": reference_points("psnr"),
                      "mte_mm": reference_points("mte")}, indent=2))
