#!/bin/bash
# Probe the TPU tunnel; when it answers, launch a run_queue.sh phase once.
# Usage: bash tools/wait_and_run.sh <phase>
# (The relay can die for hours — CLAUDE.md TPU caveat 6; this watcher turns
# recovery into an unattended queue start.)
set -u
cd "$(dirname "$0")/.."
phase="${1:-r3d}"

while :; do
  if timeout -s KILL 90 python -c "
import jax, jax.numpy as jnp
assert float(jax.jit(lambda a: (a*a).sum())(jnp.arange(64.0))) == 85344.0
" >/dev/null 2>&1; then
    echo "=== $(date '+%H:%M:%S') tunnel alive; starting queue $phase" \
      >> results/queue_r3.log
    sleep 120  # settle before the first real client
    exec bash tools/run_queue.sh "$phase"
  fi
  sleep 300
done
