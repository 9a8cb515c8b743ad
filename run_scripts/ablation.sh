#!/usr/bin/env bash
# Loss-term ablation on one scene (reference run_scripts/ablation.sh parity):
# full / no_rigid / no_momentum / no_iso variants with flow overlays.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/final_scenes}"
SCENE="${SCENE:-scene_7}"
OUT_ROOT="${OUT_ROOT:-./output/ablation}"
CONFIG="${CONFIG:-cloth_splatting_tpu/configs/mdnerf_dataset/cube.py}"

run_variant () {
  local name="$1"; shift
  python train.py -s "$DATA_ROOT/$SCENE" -m "$OUT_ROOT/$name" \
    --configs "$CONFIG" --expname "ablation/$name" --lambda_w 100000 \
    --lambda_momentum 0.1 --k_nearest 5 "$@"
  python render.py -m "$OUT_ROOT/$name" -s "$DATA_ROOT/$SCENE" \
    --skip_train --skip_test --view_skip 100 --flow_skip 5 --show_flow
}

run_variant full       --lambda_rigidity 0.1 --lambda_isometric 0.01
run_variant no_rigid   --lambda_isometric 0.01
run_variant no_iso     --lambda_rigidity 0.1 --lambda_isometric 0.0
run_variant no_momentum --lambda_rigidity 0.1 --lambda_isometric 0.01 --lambda_momentum 0.0
