#!/bin/bash
# Self-driving end-of-round-3 measurement pipeline. Launched detached so it
# survives session churn. Sequencing (one chip, runs must be solo):
#   1. wait for the Stage-III finishing leg + its final eval (launch_r3g.sh
#      wrapper) to exit;
#   2. view-batch quality A/B (VERDICT r2 #4);
#   3. solo-chip perf suite: parity gate, bench configs, phase/roofline
#      breakdowns (VERDICT r2 #3).
# All output lands under _runs/ for the docs pass.
cd /root/repo
WRAPPER_PID=${1:?usage: round3_endgame.sh <wrapper_pid>}

while kill -0 "$WRAPPER_PID" 2>/dev/null; do sleep 60; done
echo "[endgame] stage3 wrapper $WRAPPER_PID exited at $(date)" \
  > _runs/endgame.log

sh scripts/ab_view_batch.sh _runs/syn150_512/data 4000 \
  > _runs/ab_view_batch.log 2>&1
echo "[endgame] A/B done at $(date)" >> _runs/endgame.log

sh scripts/solo_perf_suite.sh > _runs/solo_perf.log 2>&1
echo "[endgame] solo perf suite done at $(date)" >> _runs/endgame.log
