#!/bin/bash
# Extra job: train-round wall-clock profile at the reference's exact
# geometry (B=8, unroll 512, 16 grad steps) — VERDICT r4 item 4.
# Invoked by run_queue_r5.sh phase F with a 2700 s cap; budget goes to
# ~5 XLA compiles (scanned rounds / rollouts / updates / evals + the
# host-driven single round), measurement itself is seconds.
set -u
cd "$(dirname "$0")/.."
if [ "$(date +%s)" -gt "$(date -d 'today 16:05' +%s)" ]; then
  echo "past 16:05 — leaving the chip for the driver"; exit 0
fi
python tools/profile_train_round.py --mult 1 --rounds 4 --evals 2
