#!/bin/sh
# Round-4 post-campaign chip work, in priority order. Launch ONLY when the
# stage-3 campaign is done (campaign_done.txt) or aborted — these need a
# solo chip for valid timings.
set -x
cd "$(dirname "$0")/.."
mkdir -p _runs/perf_r4
sh scripts/wait_backend.sh || exit 1

# 0. growth tail on the full leg's output (CPU, minutes): the round-4
#    growth recipe (+2x2mm tips + merge) added +0.013 F1 and +0.06
#    strand-consistency on the post-merge state; apply it to whatever the
#    full leg produced and score both.
if [ -d _runs/s3_full/point_cloud ]; then
  python scripts/grow_and_save.py -m _runs/s3_full --out _runs/s3_full_grown \
    > _runs/s3_full_grown.log 2>&1
  GLAST=$(ls _runs/s3_full_grown/point_cloud 2>/dev/null \
    | sed 's/iteration_//' | sort -n | tail -1)
  [ -n "$GLAST" ] && python eval.py -s _runs/syn150_512/data \
    -p "_runs/s3_full_grown/point_cloud/iteration_$GLAST/point_cloud.ply" \
    -pt gs -m _runs/s3_full_grown >> _runs/s3_full_grown.log 2>&1
  echo "full_grown rc=$?" >> _runs/s3_full_grown.log
fi

# 0b. alignment tail on the headline leg (oracle probe: every 0.5mm of
#    coherent motion ~ +0.05 F1) — extends a successful `full` leg or
#    rescues a merely-close one; ~40 min. NOTE: the round-4 linearized
#    probes predict gradient polish holds rather than improves F1; the
#    growth tail above is the measured positive lever.
if [ -d _runs/s3_full/point_cloud ]; then
  sh scripts/stage3_corrective.sh polish_from _runs/s3_full \
    > _runs/s3_full_polish.log 2>&1
  echo "full_polish rc=$?" >> _runs/s3_full_polish.log
fi

# 1. solo perf A/Bs: compact table + stats gating + binning sub-phases
sh scripts/solo_perf_r4.sh > _runs/perf_r4/solo_suite.log 2>&1
echo "solo_perf rc=$?" >> _runs/perf_r4/solo_suite.log

# 2. async-topology sustained-rate A/B (VERDICT r3 #4; self-contained)
sh scripts/topo_async_ab.sh > _runs/perf_r4/topo_ab.log 2>&1
echo "topo_ab rc=$?" >> _runs/perf_r4/topo_ab.log

# 3. AA Stage-I probe (VERDICT r3 #6): 800-iter legs with/without
#    --antialiasing on the 512^2 scene; compare masked-PSNR (the
#    thin-strand darkness is rooted in Stage I).
DATA=_runs/syn150_512/data
for AA in off on; do
  OUT=_runs/s1_aa_$AA
  rm -rf "$OUT"
  EXTRA=""
  [ "$AA" = on ] && EXTRA="--antialiasing"
  python train.py -s "$DATA" -m "$OUT" $EXTRA --logger none \
    --iterations 800 --position_lr_max_steps 30000 \
    --save_frequency 800 --eval_frequency 400 \
    > _runs/perf_r4/s1_aa_$AA.log 2>&1
  echo "aa_$AA rc=$?" >> _runs/perf_r4/s1_aa_$AA.log
done

date > _runs/perf_r4/after_campaign_done.txt

# 4. headline run at the reference-native 1000^2 convention (multi-hour;
#    resumable — safe to start at the tail of the round and let the next
#    session/round harvest it). Skipped if already complete.
if [ ! -f _runs/syn150_1k/done.txt ]; then
  sh scripts/run_reference_schedule_1k.sh > _runs/perf_r4/sched_1k.log 2>&1
  echo "sched_1k rc=$?" >> _runs/perf_r4/sched_1k.log
fi
