#!/bin/sh
# CPU smoke of the EXACT stage3_corrective.sh flag combinations at tiny
# scale (64px, 20 strands): the corrective legs are the round's headline
# chip work, and their flag set (--antialiasing --async_topology
# --feat_bf16 --pair_capacity {-1,0} --freeze_tile_budget, pinned-LR
# polish variant) has no single CLI-path test that runs them together —
# a flag-interaction crash hours into the chip window would forfeit the
# round. Budgets are scaled down; the flag surface is the full recipe's.
#
# Forces CPU (PALLAS_AXON_POOL_IPS= is required for JAX_PLATFORMS=cpu to
# take effect under the axon sitecustomize). ~6 min on 1 CPU.
set -ex
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
ROOT=/tmp/smoke_corrective
rm -rf "$ROOT"
mkdir -p "$ROOT"

# tiny scene + Stage I + convert/merge to produce a hair checkpoint
python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
from hairgs_tpu.data.synthetic import generate_dataset, synthetic_test_hair
from hairgs_tpu.render.renderer import RasterConfig
hair = synthetic_test_hair(num_strands=20, points_per_strand=8, seed=1)
generate_dataset(
    "/tmp/smoke_corrective/data", hair, num_cameras=6, width=64, height=64,
    cam_z=0.35, init_points="gt_hair_verts", init_subsample=3,
    raster_cfg=RasterConfig(max_tiles_per_gaussian=8, max_pairs_per_tile=128,
                            chunk=16),
)
EOF

DATA=$ROOT/data
SRC=$ROOT/model
SMALL="--max_tiles_per_gaussian 8 --max_pairs_per_tile 128 \
 --composite_chunk 16 --capacity_round 256 --logger none"

python train.py -s "$DATA" -m "$SRC" $SMALL \
  --iterations 60 --position_lr_max_steps 60 --densify_from_iter 10 \
  --densify_until_iter 50 --densification_interval 20 \
  --opacity_reset_interval 600 --save_frequency 60 --eval_frequency 60

# Stage II: clean + convert + merge (merge.py CLI, as the real pipeline)
python merge.py -s "$DATA" -m "$SRC" $SMALL --iterations 10

LAST=$(ls "$SRC/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)

# --- polish_postmerge flag set (stage3_corrective.sh polish_* legs):
# AA + worst-case pair table + frozen budget + pinned LR, all cadences off
OUT=$ROOT/s3_polish
mkdir -p "$OUT/point_cloud"
cp -r "$SRC/point_cloud/iteration_$LAST" "$OUT/point_cloud/"
python train.py -s "$DATA" -m "$OUT" $SMALL \
  --freeze_tile_budget --pair_capacity -1 --antialiasing \
  --iterations 40 \
  --position_lr_init 0.0000016 --position_lr_final 0.0000016 \
  --position_lr_max_steps 40 \
  --densify_until_iter 0 --merge_interval 1000000 \
  --growth_interval 1000000 --opacity_reset_interval 1000000 \
  --save_frequency 40 --eval_frequency 1000000
PLAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$DATA" \
  -p "$OUT/point_cloud/iteration_$PLAST/point_cloud.ply" -pt gs -m "$OUT"

# --- full-leg flag set (stage3_corrective.sh full): AA + async topology +
# feat_bf16 + adaptive compact table + frozen budget + densify window +
# lowered alpha gate (un-freezes the sub-gate splats AA creates on a model
# trained without it — see RasterConfig.alpha_min)
OUT=$ROOT/s3_full
mkdir -p "$OUT/point_cloud"
cp -r "$SRC/point_cloud/iteration_$LAST" "$OUT/point_cloud/"
python train.py -s "$DATA" -m "$OUT" $SMALL \
  --freeze_tile_budget --pair_capacity 0 --antialiasing --alpha_min 1e-5 \
  --async_topology --feat_bf16 \
  --iterations 60 --position_lr_max_steps 60 \
  --densify_until_iter 30 --densify_grad_threshold 0.0004 \
  --opacity_reset_interval 45 \
  --save_frequency 30 --eval_frequency 30
FLAST=$(ls "$OUT/point_cloud" | sed 's/iteration_//' | sort -n | tail -1)
python eval.py -s "$DATA" \
  -p "$OUT/point_cloud/iteration_$FLAST/point_cloud.ply" -pt gs -m "$OUT"

echo "=== SMOKE corrective flag sets OK ==="
