#!/bin/sh
# Wait for the TPU backend to come up (probe in a subprocess — JAX caches
# init failure in-process). Usage: sh scripts/wait_backend.sh [max_wait_s]
# Exits 0 when a probe succeeds, 1 after max_wait_s (default 2 h).
#
# The Aug-17/18 outage showed the backend flaps for hours at a time; every
# chip-agenda leg calls this first so one flap mid-campaign delays the
# remaining legs instead of cascade-failing them.
MAX=${1:-7200}
waited=0
until timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1; do
  if [ "$waited" -ge "$MAX" ]; then
    echo "wait_backend: backend still down after ${waited}s" >&2
    exit 1
  fi
  sleep 60
  waited=$((waited + 180))
done
echo "wait_backend: up after ~${waited}s"
