#!/bin/sh
# Run a train.py invocation under a stall guard: if its heartbeat file
# (/tmp/hairgs_tpu_heartbeat_<pid>, touched by train.py at every
# log-interval device sync) stops advancing for $STALL_SECS, kill the exact
# child PID (TERM then KILL — never pattern-kill) so the caller's
# checkpoint-resume retry loop can take over.
#
# Why: the Aug-19 campaign leg hung for 70+ min in futex_do_wait on a dead
# axon tunnel RPC (server lost the session in a backend flap; the ESTAB
# socket never answered). Processes don't die from that — they wait
# forever — so death-watchdogs and `|| true` retry loops never fire.
#
# Usage: sh scripts/run_with_stall_guard.sh <stall_secs> python train.py ...
# Exit status: the child's (143/137 if the guard killed it).
set -u
STALL_SECS=${1:?usage: run_with_stall_guard.sh <stall_secs> cmd...}
shift

"$@" &
PID=$!
HB="/tmp/hairgs_tpu_heartbeat_$PID"
START=$(date +%s)

while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    NOW=$(date +%s)
    if [ -f "$HB" ]; then
        AGE=$((NOW - $(stat -c %Y "$HB" 2>/dev/null || echo "$NOW")))
    else
        # no heartbeat yet: grace window covers remote compiles (first
        # topology events take 60-90 s each; step compile 1-5 min)
        AGE=$((NOW - START))
    fi
    if [ "$AGE" -gt "$STALL_SECS" ]; then
        echo "[stall_guard] pid $PID heartbeat stale ${AGE}s (> $STALL_SECS); killing" >&2
        kill "$PID" 2>/dev/null
        sleep 20
        kill -9 "$PID" 2>/dev/null
        break
    fi
done
wait "$PID"
RC=$?
rm -f "$HB"
exit "$RC"
