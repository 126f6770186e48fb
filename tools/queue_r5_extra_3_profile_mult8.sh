#!/bin/bash
# Extra job: train-round wall-clock profile at mult8 (B=64, unroll 512,
# minibatch 2048, 16 grad steps) — VERDICT r4 item 4, second geometry.
set -u
cd "$(dirname "$0")/.."
if [ "$(date +%s)" -gt "$(date -d 'today 16:05' +%s)" ]; then
  echo "past 16:05 — leaving the chip for the driver"; exit 0
fi
python tools/profile_train_round.py --mult 8 --rounds 4 --evals 2
