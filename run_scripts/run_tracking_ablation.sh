#!/usr/bin/env bash
# Tracking ablation (reference run_scripts/run_tracking_ablation.sh parity):
# gaussian-tracking vs vertex-tracking MTE on the same trained model.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-./data/folding_scenes}"
SCENE="${SCENE:-TOWEL_00_03}"
MODEL="${MODEL:-./output/$SCENE}"

python render.py -m "$MODEL" -s "$DATA_ROOT/$SCENE" --skip_train --skip_video --log_deform
mv "$MODEL/all_trajs.npz" "$MODEL/all_trajs_gaussians.npz"
python render.py -m "$MODEL" -s "$DATA_ROOT/$SCENE" --skip_train --skip_video --log_deform --track_vertices

for mode in gaussians vertices; do
  f="$MODEL/all_trajs.npz"; [ "$mode" = gaussians ] && f="$MODEL/all_trajs_gaussians.npz"
  if [ -f "$DATA_ROOT/$SCENE/gt.npz" ]; then
    echo "--- $mode ---"
    python scripts/align_eval_trajs.py --trajs "$f" --gt "$DATA_ROOT/$SCENE/gt.npz"
  fi
done
