#!/bin/bash
# Resume/continue Stage III from the latest checkpoint in the model dir,
# then run the final evaluation (same flags as run_reference_schedule.sh).
set -e
RUN=${1:-_runs/syn150_512}
DATA="$RUN/data"
OUT="$RUN/model"
COMMON="--max_tiles_per_gaussian 16 --max_pairs_per_tile 1024 --capacity_round 131072 --eval_frequency 10000 --save_frequency 1000"

echo "=== Stage III: strand-graph optimization (resume) ==="
python train.py -s "$DATA" -m "$OUT" $COMMON

echo "=== Evaluation ==="
LAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$DATA" -p "$OUT/point_cloud/iteration_$LAST/point_cloud.ply" -pt gs -m "$OUT"
echo "=== DONE ==="
