#!/usr/bin/env bash
# Legacy D-NeRF synthetic scenes through the free-xyz static fit (reference
# run_scripts/run_dnerf.sh surface; the reference's own dnerf path runs its
# stale full_eval harness — here fit_legacy.py is the live equivalent).
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/dnerf}"
OUT_ROOT="${OUT_ROOT:-./output/dnerf}"
SCENES=(${SCENES:-bouncingballs hellwarrior hook jumpingjacks lego mutant standup trex})
ITERS="${ITERS:-2000}"

for scene in "${SCENES[@]}"; do
  [ -d "$DATA_ROOT/$scene" ] || { echo "skip $scene (no data)"; continue; }
  python fit_legacy.py -s "$DATA_ROOT/$scene" -m "$OUT_ROOT/$scene" \
    --type Blender -w --iterations "$ITERS"
done
python scripts/read_all_metrics.py --root "$OUT_ROOT"
