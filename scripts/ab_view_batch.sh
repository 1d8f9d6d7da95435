#!/bin/bash
# View-batch training-quality A/B (VERDICT r2 #4): equal views seen.
#
# A: 4000 sequential reference-semantics iterations (one view/step).
# B: --view_batch 8 (500 steps x 8-view mean; the iteration counter advances
#    by 8 per step, so every cadence fires at the same view counts).
# Both train Stage I from scratch on the same scene; compare PSNR/SSIM and
# strand precision/recall/F1 at the end.
set -e
DATA=${1:-_runs/syn150_512/data}
ITERS=${2:-4000}
# 64 frozen up front: ≥512² scenes otherwise trigger two adaptive-budget
# recompiles (16->32->64) in the first 100 iters, minutes each on the remote
# TPU compile helper (see CLAUDE.md), identically in both legs.
COMMON="--max_tiles_per_gaussian 64 --freeze_tile_budget --max_pairs_per_tile 1024 \
 --capacity_round 131072 \
 --save_frequency $ITERS --eval_frequency $ITERS --logger none --iterations $ITERS"

for CFG in "seq 1" "vb8 8"; do
  set -- $CFG
  NAME=$1; VB=$2
  OUT="_runs/ab_$NAME"
  rm -rf "$OUT"
  echo "=== A/B $NAME (view_batch=$VB) ==="
  python train.py -s "$DATA" -m "$OUT" $COMMON --view_batch "$VB"
  python eval.py -s "$DATA" -p "$OUT/point_cloud/iteration_$ITERS/point_cloud.ply" -pt gs -m "$OUT"
done
echo "=== A/B DONE ==="
