#!/bin/sh
# Post-campaign chip work, ROUND-5 agenda (this file is invoked by
# r4_rebuild_campaign.sh step 8 once the stage-3 legs finish; rewritten in
# round 5 — the round-4 items it replaced are either done or superseded,
# see docs/ROUND5.md).
set -x
cd "$(dirname "$0")/.."
mkdir -p _runs/perf_r5
sh scripts/wait_backend.sh || exit 1

# 0. growth tail on the full leg's output (host-side, minutes): the growth
#    recipe measured +0.024 F1 on the post-merge state this round
#    (0.5120 -> 0.5359, _runs/s3_growth/eval.txt); apply to whatever the
#    full leg produced and score it.
if [ -d _runs/s3_full/point_cloud ] && [ ! -f _runs/s3_full_grown.log ]; then
  python scripts/grow_and_save.py -m _runs/s3_full --out _runs/s3_full_grown \
    > _runs/s3_full_grown.log 2>&1
  GLAST=$(ls _runs/s3_full_grown/point_cloud 2>/dev/null \
    | sed 's/iteration_//' | sort -n | tail -1)
  [ -n "$GLAST" ] && python eval.py -s _runs/syn150_512/data \
    -p "_runs/s3_full_grown/point_cloud/iteration_$GLAST/point_cloud.ply" \
    -pt gs -m _runs/s3_full_grown >> _runs/s3_full_grown.log 2>&1
  echo "full_grown rc=$?" >> _runs/s3_full_grown.log
fi

# 1. round-5 parity gate (error-model comparison, scripts/tpu_parity_check.py)
if ! grep -q "^PASS" _runs/perf_r5/parity.txt 2>/dev/null; then
  python scripts/tpu_parity_check.py > _runs/perf_r5/parity.txt 2>&1
  echo "parity rc=$?" >> _runs/perf_r5/parity.txt
fi

# 2. solo headline bench at the round-5 defaults (compact pair table +
#    DMA lookahead now default-on) + the cheap knob A/Bs that never got
#    solo time: deeper prefetch via tiles_per_step, bf16 feature plane.
python bench.py > _runs/perf_r5/bench_headline.json 2>_runs/perf_r5/bench_headline.err
python bench.py --tiles_per_step 64 \
  > _runs/perf_r5/bench_tps64.json 2>/dev/null
python bench.py --feat_bf16 \
  > _runs/perf_r5/bench_bf16.json 2>/dev/null
python bench.py --max_tiles 8 --feat_bf16 \
  > _runs/perf_r5/bench_r8_bf16.json 2>/dev/null
date > _runs/perf_r5/bench_done.txt

# 2.5 USC-scale dress rehearsal stages 2-3 (VERDICT r4 item 8): short
#     Stage-I fit + full eval grid at the reference's native workload
#     (10k strands / ~990k GT points / 16 views at 1000^2). Dataset was
#     built earlier on CPU; this is ~30-60 min of chip incl. compile.
if [ ! -f _runs/usc_rehearsal/done.txt ]; then
  sh scripts/usc_dress_rehearsal.sh > _runs/usc_rehearsal/run.log 2>&1
  echo "usc rc=$?" >> _runs/usc_rehearsal/run.log
fi

# 3. headline run at the reference-native 1000^2 convention (multi-hour;
#    resumable — safe to start at the tail of the round and let the next
#    session/round harvest it). Skipped if already complete.
if [ ! -f _runs/syn150_1k/done.txt ]; then
  sh scripts/run_reference_schedule_1k.sh > _runs/perf_r5/sched_1k.log 2>&1
  echo "sched_1k rc=$?" >> _runs/perf_r5/sched_1k.log
fi

# 4. resume the `full` corrective leg's remaining iterations (its first
#    attempt hung on a dead axon-tunnel RPC at iter ~2600 and was killed;
#    eval of its last checkpoint already ran). Lowest priority: the
#    round-5 official quality chain is already on record (0.5359), this
#    leg is the densify+AA corrective bonus. Resumable + stall-guarded.
LAST_FULL=$(ls _runs/s3_full/point_cloud 2>/dev/null \
  | sed 's/iteration_//' | sort -n | tail -1)
if [ -n "$LAST_FULL" ] && [ "$LAST_FULL" -lt 40017 ]; then
  sh scripts/wait_backend.sh
  sh scripts/run_with_stall_guard.sh 1800 \
    python train.py -s _runs/syn150_512/data -m _runs/s3_full \
    --max_tiles_per_gaussian 64 --freeze_tile_budget \
    --max_pairs_per_tile 2048 --capacity_round 131072 --logger none \
    --pair_capacity 0 --antialiasing --alpha_min 0.00001 \
    --async_topology --feat_bf16 \
    --iterations $((40017 - LAST_FULL)) --position_lr_max_steps 10000 \
    --densify_until_iter $(( 35017 > LAST_FULL ? 35017 - LAST_FULL : 0 )) \
    --densify_grad_threshold 0.0004 --opacity_reset_interval 3000 \
    --save_frequency 1000 --eval_frequency 5000 \
    >> _runs/s3_full.log 2>&1
  LAST=$(ls _runs/s3_full/point_cloud | sed 's/iteration_//' | sort -n | tail -1)
  python eval.py -s _runs/syn150_512/data \
    -p "_runs/s3_full/point_cloud/iteration_$LAST/point_cloud.ply" \
    -pt gs -m _runs/s3_full >> _runs/s3_full.log 2>&1
  python scripts/grow_and_save.py -m _runs/s3_full \
    --out _runs/s3_full_grown2 >> _runs/s3_full.log 2>&1
  G2=$(ls _runs/s3_full_grown2/point_cloud 2>/dev/null \
    | sed 's/iteration_//' | sort -n | tail -1)
  [ -n "$G2" ] && python eval.py -s _runs/syn150_512/data \
    -p "_runs/s3_full_grown2/point_cloud/iteration_$G2/point_cloud.ply" \
    -pt gs -m _runs/s3_full_grown2 >> _runs/s3_full.log 2>&1
fi
