#!/usr/bin/env bash
# Isometry-regularizer ablation sweep (reference run_scripts/isometry_ablation.sh
# parity): log-spaced lambda_isometric values per scene, rendered + aligned so
# scripts/iso_ablation_plots.py can consume the results.
#
# Usage: DATA_ROOT=./data/final_scenes bash run_scripts/isometry_ablation.sh
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/final_scenes}"
OUT_ROOT="${OUT_ROOT:-./output/iso_ablation}"
CONFIG="${CONFIG:-cloth_splatting_tpu/configs/mdnerf_dataset/cube.py}"
SCENES=(${SCENES:-scene_1 scene_2 scene_3 scene_5 scene_6 scene_7})
# evenly spaced on log scale (reference isometry_ablation.sh:4-8)
ISOMETRIES=(${ISOMETRIES:-0.01 0.0316227766 0.1 0.316227766 1.0})
RIGIDITY_LAMBDA="${RIGIDITY_LAMBDA:-0.1}"
LAMBDA_SPRING="${LAMBDA_SPRING:-0.0}"

for SCENE in "${SCENES[@]}"; do
  for isometry in "${ISOMETRIES[@]}"; do
    expdir="$OUT_ROOT/${SCENE}_l${isometry}"
    python train.py -s "$DATA_ROOT/$SCENE" -m "$expdir" \
      --configs "$CONFIG" --expname "iso_ablation/${SCENE}_${isometry}" \
      --lambda_w 100000 --lambda_rigidity "$RIGIDITY_LAMBDA" \
      --lambda_spring "$LAMBDA_SPRING" --lambda_momentum 0.1 \
      --k_nearest 5 --lambda_isometric "$isometry"
    python render.py -m "$expdir" -s "$DATA_ROOT/$SCENE" \
      --skip_train --skip_video --log_deform
    python metrics.py -m "$expdir"
    if [ -f "$DATA_ROOT/$SCENE/gt.npz" ]; then
      python scripts/align_eval_trajs.py \
        --trajs "$expdir/all_trajs.npz" --gt "$DATA_ROOT/$SCENE/gt.npz"
    fi
  done
done

python scripts/iso_ablation_plots.py --root "$OUT_ROOT"
