#!/bin/bash
# Full reference-schedule run at the reference's NATIVE camera convention
# (1000x1000, utils/camera.py:62-99): synthetic 150-strand scene, 16 cams.
#   Stage I: 30k -> Stage II merge -> Stage III: 30k -> eval.
#
# Round-4 recipe differences vs scripts/run_reference_schedule.sh, from the
# round-3 Stage-III post-mortem (BASELINE.md):
#   --antialiasing        Mip-Splatting compensation for the 1px-strand
#                         regime (uncompensated dilation darkened thin
#                         strands: masked-PSNR ~8 at 512^2);
#   overflow-zero budgets r=64 / max_pairs 2048 (tile-cap drops starved
#                         the deepest pairs' gradients);
#   --async_topology      topology events off the critical path at
#                         Stage-III segment counts;
#   doubled densify_grad_threshold (0.0004): the reference's 0.0002 is
#                         tuned for real captures; on this synthetic scene
#                         it drove 7x over-densification.
# Launch ONLY after stage3_corrective polish_postmerge validates the
# AA+clean-budget recovery slope (docs/ROUND4_PLAN.md).
#
# Usage: sh scripts/run_reference_schedule_1k.sh [run_dir]
set -e
RUN=${1:-_runs/syn150_1k}
DATA="$RUN/data"
OUT="$RUN/model"
mkdir -p "$RUN"

if [ ! -f "$DATA/sparse/0/points3D.bin" ]; then
  echo "=== Generating synthetic dataset (150 strands, 16 cams, 1000^2) ==="
  python - "$DATA" <<'EOF'
import sys
from hairgs_tpu.data.synthetic import generate_dataset, synthetic_test_hair

hair = synthetic_test_hair(num_strands=150, points_per_strand=24, seed=0)
generate_dataset(sys.argv[1], hair, num_cameras=16, width=1000, height=1000)
print("dataset done:", sys.argv[1], hair.edges.shape[0], "GT segments")
EOF
fi

COMMON="--max_tiles_per_gaussian 64 --freeze_tile_budget \
 --max_pairs_per_tile 2048 --capacity_round 131072 \
 --eval_frequency 10000 --antialiasing --logger none"

echo "=== Stage I: Gaussian splatting fit (30k) ==="
python train.py -s "$DATA" -m "$OUT" $COMMON

echo "=== Stage II: segment conversion + greedy merge ==="
python merge.py -s "$DATA" -m "$OUT"

echo "=== Stage III: strand-graph optimization (30k) ==="
python train.py -s "$DATA" -m "$OUT" $COMMON \
  --async_topology --densify_grad_threshold 0.0004

echo "=== Evaluation ==="
LAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$DATA" -p "$OUT/point_cloud/iteration_$LAST/point_cloud.ply" -pt gs -m "$OUT"
echo "=== DONE ==="
