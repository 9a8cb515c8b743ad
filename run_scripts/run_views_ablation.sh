#!/usr/bin/env bash
# Camera-count ablation (reference run_scripts/run_views_ablation.sh parity):
# train with increasing view_skip (fewer training cameras).
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/folding_scenes}"
SCENE="${SCENE:-TOWEL_00_03}"
OUT_ROOT="${OUT_ROOT:-./output/views_ablation}"
CONFIG="${CONFIG:-cloth_splatting_tpu/configs/cloth_splatting/default.py}"

for skip in 1 2 3 4 6; do
  python train.py -s "$DATA_ROOT/$SCENE" -m "$OUT_ROOT/skip_$skip" \
    --configs "$CONFIG" --view_skip "$skip" --expname "views_ablation/skip_$skip"
  python render.py -m "$OUT_ROOT/skip_$skip" -s "$DATA_ROOT/$SCENE" --skip_train
  python metrics.py -m "$OUT_ROOT/skip_$skip"
done
python scripts/read_all_metrics.py --root "$OUT_ROOT"
