#!/bin/sh
# Keep the round-4 chip campaign alive across backend outages longer than
# its own 10 h wait window. Run detached (setsid nohup). Every 5 min:
#   - exit once the campaign has finished (campaign_done.txt);
#   - if the campaign aborted (campaign_abort.txt) and no r4_campaign.sh
#     process is alive, clear the abort marker and relaunch (max 3 times —
#     a campaign that aborts repeatedly needs a human/agent, not a loop).
# Checking liveness with ps|grep is fine; this script never kills anything.
cd "$(dirname "$0")/.."
mkdir -p _runs/perf_r4
CAMPAIGN=${1:-scripts/r4_campaign.sh}
CNAME=$(basename "$CAMPAIGN" .sh)
COUNT_FILE=_runs/perf_r4/watchdog_relaunches.txt
[ -f "$COUNT_FILE" ] || echo 0 > "$COUNT_FILE"
while :; do
  if [ -f _runs/perf_r4/campaign_done.txt ]; then
    echo "campaign done; watchdog exiting" >> _runs/perf_r4/watchdog.log
    exit 0
  fi
  alive=$(ps -ef | grep "[${CNAME%"${CNAME#?}"}]${CNAME#?}.sh" | wc -l)
  if [ "$alive" -eq 0 ]; then
    n=$(cat "$COUNT_FILE")
    if [ "$n" -ge 3 ]; then
      echo "$(date): campaign dead, relaunch budget exhausted ($n)" \
        >> _runs/perf_r4/watchdog.log
      exit 1
    fi
    echo $((n + 1)) > "$COUNT_FILE"
    rm -f _runs/perf_r4/campaign_abort.txt
    echo "$(date): campaign not running; relaunch #$((n + 1))" \
      >> _runs/perf_r4/watchdog.log
    setsid nohup sh "$CAMPAIGN" \
      > _runs/perf_r4/campaign_relaunch_$((n + 1)).log 2>&1 < /dev/null &
  fi
  sleep 300
done
