#!/bin/bash
# Follow-on to scripts/round3_endgame.sh: once the solo perf suite has
# released the chip, run the async-topology sustained-rate A/B.
cd /root/repo
while ! grep -q "solo perf suite done" _runs/endgame.log 2>/dev/null; do
  sleep 60
done
echo "[after_endgame] chip free at $(date)" > _runs/after_endgame.log
sh scripts/topo_async_ab.sh >> _runs/after_endgame.log 2>&1
echo "[after_endgame] topo A/B done at $(date)" >> _runs/after_endgame.log
