#!/usr/bin/env bash
# Full pipeline over the folding scenes (reference run_scripts/run_all.sh:1-17
# parity): train each scene, render with tracking export, compute NVS metrics
# and tracking MTE.
#
# Usage: DATA_ROOT=/path/to/folding_scenes bash run_scripts/run_all.sh
#
# SCENE_PARALLEL=1 trains the sweep on a ('scene',) device mesh — scenes of
# the same garment type (same static shapes) optimize simultaneously, one
# per device, zero collectives (cloth_splatting_tpu/parallel/sweep.py).
# Rendering/metrics still run per scene afterwards.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/folding_scenes}"
OUT_ROOT="${OUT_ROOT:-./output}"
SCENES=(${SCENES:-TOWEL_00_03 TSHIRT_01_00 TSHIRT_01_01 SHORTS_01_00 SHORTS_01_01})
CONFIG="${CONFIG:-cloth_splatting_tpu/configs/cloth_splatting/default.py}"
VIEW_SKIP="${VIEW_SKIP:-3}"
SCENE_PARALLEL="${SCENE_PARALLEL:-0}"

if [ "$SCENE_PARALLEL" = "1" ]; then
  SCENE_DIRS=()
  for scene in "${SCENES[@]}"; do SCENE_DIRS+=("$DATA_ROOT/$scene"); done
  python train_scenes.py --scenes "${SCENE_DIRS[@]}" --out_root "$OUT_ROOT" \
    --configs "$CONFIG" --view_skip "$VIEW_SKIP"
fi

for scene in "${SCENES[@]}"; do
  echo "=== $scene ==="
  if [ "$SCENE_PARALLEL" != "1" ]; then
    python train.py -s "$DATA_ROOT/$scene" -m "$OUT_ROOT/$scene" \
      --configs "$CONFIG" --view_skip "$VIEW_SKIP" --expname "$scene"
  fi
  python render.py -m "$OUT_ROOT/$scene" -s "$DATA_ROOT/$scene" \
    --skip_train --log_deform --track_vertices
  python metrics.py -m "$OUT_ROOT/$scene"
  if [ -f "$DATA_ROOT/$scene/gt.npz" ]; then
    python scripts/align_eval_trajs.py \
      --trajs "$OUT_ROOT/$scene/all_trajs.npz" --gt "$DATA_ROOT/$scene/gt.npz"
  fi
done

python scripts/read_all_metrics.py --root "$OUT_ROOT"
