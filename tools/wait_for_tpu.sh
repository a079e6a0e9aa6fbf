#!/bin/bash
# Poll the axon TPU tunnel until it answers. Exits 0 as soon as
# `jax.devices()` returns (probed in a bounded subprocess so a hung tunnel
# can't wedge the watcher), exits 1 after the deadline.
#
#   bash tools/wait_for_tpu.sh [deadline_s] [interval_s]
set -u
DEADLINE="${1:-36000}"
INTERVAL="${2:-180}"
START=$(date +%s)
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" 2>/dev/null; then
    echo "tunnel UP after $(( $(date +%s) - START ))s"
    exit 0
  fi
  ELAPSED=$(( $(date +%s) - START ))
  echo "tunnel still down at ${ELAPSED}s"
  if [ "$ELAPSED" -ge "$DEADLINE" ]; then
    echo "deadline reached; giving up"
    exit 1
  fi
  sleep "$INTERVAL"
done
