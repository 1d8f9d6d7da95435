#!/bin/bash
# Sustained-rate A/B for --async_topology at Stage-III scale (VERDICT r2 #2:
# hide the ~10 s topology events behind train steps).
#
# Runs two 600-iteration measurement legs from a COPY of the latest
# Stage-III checkpoint (the real model dir is never touched): identical
# schedules with a densify+merge event every 100 iters, one leg synchronous,
# one with --async_topology. Compare with scripts/log_rate.py (the windowed
# rate INCLUDES the events). Solo chip required.
set -e
cd /root/repo
SRC=${1:-_runs/syn150_512/model}
DATA=${2:-_runs/syn150_512/data}
ITERS=${3:-600}
LAST=$(ls "$SRC/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
echo "[topo_ab] base checkpoint: iteration_$LAST"

for MODE in sync async; do
  OUT=_runs/topo_ab_$MODE
  rm -rf "$OUT"
  mkdir -p "$OUT/point_cloud"
  cp -r "$SRC/point_cloud/iteration_$LAST" "$OUT/point_cloud/"
  [ -f "$SRC/cfg_args" ] && cp "$SRC/cfg_args" "$OUT/"
  EXTRA=""
  [ "$MODE" = async ] && EXTRA="--async_topology"
  echo "[topo_ab] leg $MODE"
  python train.py -s "$DATA" -m "$OUT" \
    --max_tiles_per_gaussian 8 --freeze_tile_budget --max_pairs_per_tile 1024 \
    --feat_bf16 --capacity_round 131072 \
    --iterations "$ITERS" --position_lr_max_steps "$ITERS" \
    --densify_from_iter 0 --densify_until_iter "$ITERS" \
    --densification_interval 100 --merge_interval 100 \
    --opacity_reset_interval 1000000 --growth_interval 1000000 \
    --save_frequency 1000000 --eval_frequency 1000000 --logger none \
    $EXTRA > "_runs/topo_ab_$MODE.log" 2>&1
  python scripts/log_rate.py "_runs/topo_ab_$MODE.log" --window 100 \
    | tee "_runs/topo_ab_$MODE.rate"
done
echo "[topo_ab] DONE"
