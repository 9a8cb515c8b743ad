#!/usr/bin/env bash
# Temporal-resolution ablation (reference run_scripts/time_ablation.sh parity):
# train with increasing time_skip (fewer timesteps).
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/folding_scenes}"
SCENE="${SCENE:-TOWEL_00_03}"
OUT_ROOT="${OUT_ROOT:-./output/time_ablation}"
CONFIG="${CONFIG:-cloth_splatting_tpu/configs/cloth_splatting/default.py}"

for skip in 1 2 4; do
  python train.py -s "$DATA_ROOT/$SCENE" -m "$OUT_ROOT/tskip_$skip" \
    --configs "$CONFIG" --time_skip "$skip" --expname "time_ablation/tskip_$skip"
  python render.py -m "$OUT_ROOT/tskip_$skip" -s "$DATA_ROOT/$SCENE" \
    --skip_train --log_deform
  python metrics.py -m "$OUT_ROOT/tskip_$skip"
  if [ -f "$DATA_ROOT/$SCENE/gt.npz" ]; then
    python scripts/align_eval_trajs.py \
      --trajs "$OUT_ROOT/tskip_$skip/all_trajs.npz" --gt "$DATA_ROOT/$SCENE/gt.npz"
  fi
done
