#!/bin/bash
# Time-gated follow-on to scripts/round3_endgame.sh (replaces after_endgame.sh,
# whose unconditional topo A/B risked holding the chip when the driver runs
# the round-end bench). Runs the async-topology sustained-rate A/B only if
# the solo perf suite releases the chip before the cutoff; otherwise leaves
# the A/B for round 4 (scripts/topo_async_ab.sh is self-contained).
cd /root/repo
CUTOFF_EPOCH=${1:?usage: after_endgame2.sh <cutoff-epoch-seconds>}
while ! grep -q "solo perf suite done" _runs/endgame.log 2>/dev/null; do
  sleep 60
done
NOW=$(date +%s)
echo "[after_endgame2] chip free at $(date)" > _runs/after_endgame.log
if [ "$NOW" -ge "$CUTOFF_EPOCH" ]; then
  echo "[after_endgame2] past cutoff ($NOW >= $CUTOFF_EPOCH): skipping topo" \
       "A/B so the chip is free for the round-end bench" \
       >> _runs/after_endgame.log
  exit 0
fi
# 400-iter legs (4 topology events each): enough for a windowed sustained
# rate, short enough to be off the chip ~15 min after the gate opens.
sh scripts/topo_async_ab.sh _runs/syn150_512/model _runs/syn150_512/data 400 \
  >> _runs/after_endgame.log 2>&1
echo "[after_endgame2] topo A/B done at $(date)" >> _runs/after_endgame.log
