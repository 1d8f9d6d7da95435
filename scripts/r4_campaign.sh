#!/bin/sh
# Round-4 chip campaign (VERDICT r3 items 1, 2, 4): runs unattended under
# setsid so it survives session death. Order:
#   0. wait (up to ~4 h) for the TPU backend to come back — it was down at
#      campaign launch, the same transient outage that cost round 3 its
#      official artifacts;
#   1. on-TPU pallas-vs-XLA parity gate (VERDICT #2) -> _runs/perf_r4/parity.txt
#   2. stage3_corrective polish_postmerge (~40 min validation leg)
#   3. stage3_corrective full (multi-hour headline leg; target F1(b) > 0.518)
# Each stage logs under _runs/. A stage that fails does NOT stop the next
# (the legs are independently useful), except that the whole campaign aborts
# if the backend never comes up.
set -x
cd "$(dirname "$0")/.."
mkdir -p _runs/perf_r4

# --- 0. wait for backend (probe in subprocesses; JAX caches init failure)
# Wait up to 10 h: the Aug-17 outage already exceeded the original 4 h
# window once; the rest of the round is the only budget that matters.
waited=0
until timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1; do
  waited=$((waited + 180))
  date > _runs/perf_r4/campaign_waiting.txt
  echo "waited ~${waited}s" >> _runs/perf_r4/campaign_waiting.txt
  if [ "$waited" -gt 36000 ]; then
    echo "backend never came up after ${waited}s; aborting campaign" \
      > _runs/perf_r4/campaign_abort.txt
    exit 1
  fi
  sleep 60
done
echo "backend up after ~${waited}s of waiting" > _runs/perf_r4/campaign_start.txt
date >> _runs/perf_r4/campaign_start.txt

# --- 1. parity gate
python scripts/tpu_parity_check.py > _runs/perf_r4/parity.txt 2>&1
echo "parity rc=$?" >> _runs/perf_r4/parity.txt

# --- 1.5 quick bench A/Bs of the round-4 perf knobs (~40 min) — runs
# BEFORE the multi-hour quality legs so the default-flip decision data
# (and a fresh stale-fallback artifact for the driver's BENCH capture)
# exists even if the quality legs run to the end of the round.
sh scripts/solo_bench_ab.sh > _runs/perf_r4/bench_ab.log 2>&1
echo "bench_ab rc=$?" >> _runs/perf_r4/bench_ab.log

# --- 2. validation polish from the healthy post-merge state
sh scripts/stage3_corrective.sh polish_postmerge \
  > _runs/s3_polish_postmerge.log 2>&1
echo "polish_postmerge rc=$?" >> _runs/s3_polish_postmerge.log

# --- 2.5 no-densify ALIGNMENT leg (insurance headline): the round-4
# geometric diagnosis shows precision loss is fine misalignment, so a
# 2k-iter clean-gradient leg at a real position LR can cross F1 0.518
# without the densify dynamics that sank round 3 — and its checkpoint is
# a valid headline even if the multi-hour `full` leg gets truncated.
sh scripts/stage3_corrective.sh polish_lr > _runs/s3_polish_lr.log 2>&1
echo "polish_lr rc=$?" >> _runs/s3_polish_lr.log

# --- 3. headline corrective leg
sh scripts/stage3_corrective.sh full > _runs/s3_full.log 2>&1
echo "full rc=$?" >> _runs/s3_full.log

date > _runs/perf_r4/campaign_done.txt

# --- 4. post-campaign solo suite (breakdowns, topo A/B, AA probe) — chained
# so the measurements happen even if no interactive session is alive.
sh scripts/r4_after_campaign.sh > _runs/perf_r4/after_campaign.log 2>&1
echo "after_campaign rc=$?" >> _runs/perf_r4/after_campaign.log
