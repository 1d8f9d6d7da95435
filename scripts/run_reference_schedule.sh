#!/bin/bash
# Full reference-schedule validation run (BASELINE.json north star):
#   synthetic 150-strand scene, 16 cameras, 512x512
#   Stage I: 30k iters -> Stage II merge -> Stage III: 30k iters -> eval.
# Mirrors the reference run_full_pipeline_single.sh with its default
# OptimizationParams (arguments/__init__.py:72-111 in /root/reference).
#
# Usage: sh scripts/run_reference_schedule.sh [run_dir]
set -e
RUN=${1:-_runs/syn150_512}
DATA="$RUN/data"
OUT="$RUN/model"
mkdir -p "$RUN"

if [ ! -f "$DATA/sparse/0/points3D.bin" ]; then
  echo "=== Generating synthetic dataset (150 strands, 16 cams, 512^2) ==="
  python - "$DATA" <<'EOF'
import sys
from hairgs_tpu.data.synthetic import generate_dataset, synthetic_test_hair

hair = synthetic_test_hair(num_strands=150, points_per_strand=24, seed=0)
generate_dataset(sys.argv[1], hair, num_cameras=16, width=512, height=512)
print("dataset done:", sys.argv[1], hair.edges.shape[0], "GT segments")
EOF
fi

# max_tiles=64 up front: the adaptive grower otherwise triggers two
# recompiles (16->32->64) in the first 100 iters at >=512^2 (CLAUDE.md).
COMMON="--max_tiles_per_gaussian 64 --capacity_round 65536 --eval_frequency 10000"

echo "=== Stage I: Gaussian splatting fit (30k) ==="
python train.py -s "$DATA" -m "$OUT" $COMMON

echo "=== Stage II: segment conversion + greedy merge ==="
python merge.py -s "$DATA" -m "$OUT"

echo "=== Stage III: strand-graph optimization (30k) ==="
python train.py -s "$DATA" -m "$OUT" $COMMON

echo "=== Evaluation ==="
LAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$DATA" -p "$OUT/point_cloud/iteration_$LAST/point_cloud.ply" -pt gs -m "$OUT"
echo "=== DONE ==="
