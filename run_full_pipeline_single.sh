#!/bin/bash
# Full 3-stage reconstruction of one scene (reference run_full_pipeline_single.sh).
#   $1 = dataset path (COLMAP scene with masks/orientations/GT npz)
#   $2 = model output path
set -e
SRC=${1:?usage: run_full_pipeline_single.sh <source_path> <model_path>}
OUT=${2:?usage: run_full_pipeline_single.sh <source_path> <model_path>}

echo "=== Stage I: Gaussian splatting fit ==="
python train.py -s "$SRC" -m "$OUT"

echo "=== Stage II: segment conversion + greedy merge ==="
python merge.py -s "$SRC" -m "$OUT"

echo "=== Stage III: strand-graph optimization ==="
python train.py -s "$SRC" -m "$OUT"

echo "=== Evaluation ==="
LAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$SRC" -p "$OUT/point_cloud/iteration_$LAST/point_cloud.ply" -pt gs
