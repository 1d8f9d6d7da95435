#!/bin/bash
# Carry Stage III to 30k TOTAL Stage-III iterations and run the final eval.
#
# Round 2 completed 7k of the 30k Stage-III schedule (checkpoint 37017 =
# 30017 post-merge + 7000). The reference train loop always runs a fresh
# `iterations`-long schedule on resume (train.py:91, range(1, iterations+1)
# regardless of loaded_iter), so this leg runs the REMAINING 23000 with the
# densify window and LR horizon scaled to the leg (0.9 ratio / decay-to-final
# at leg end), landing on iteration 60017 = the reference's 30k total.
set -e
RUN=${1:-_runs/syn150_512}
ITERS=${2:-23000}
DATA="$RUN/data"
OUT="$RUN/model"
DENSIFY_UNTIL=$((ITERS * 9 / 10))
# Throughput config so the leg fits the round's wall clock (measured 0.5 it/s
# at 663k segments with r16/f32/1024): post-cull tile budgets make r_max=8
# near-lossless for thin segments, plus bf16 features — the same config the
# bench measured at 16.55 it/s vs 11.68 for r16/f32. max_pairs stays 1024
# (the pallas kernel wants max_pairs/chunk % 8 == 0 at chunk 128).
COMMON="--max_tiles_per_gaussian 8 --freeze_tile_budget --max_pairs_per_tile 1024 \
 --feat_bf16 --capacity_round 131072 --eval_frequency 10000 --save_frequency 2000"

echo "=== Stage III: strand-graph optimization (final $ITERS-iter leg) ==="
python train.py -s "$DATA" -m "$OUT" $COMMON \
  --iterations "$ITERS" --position_lr_max_steps "$ITERS" \
  --densify_until_iter "$DENSIFY_UNTIL"

echo "=== Evaluation ==="
LAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$DATA" -p "$OUT/point_cloud/iteration_$LAST/point_cloud.ply" -pt gs -m "$OUT"
echo "=== DONE ==="
