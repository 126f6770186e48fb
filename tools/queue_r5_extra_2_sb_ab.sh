#!/bin/bash
# Extra job: megastep sublane-batch A/B on the real chip — VERDICT r4
# item 6 (prototype ONE shape lever, measured). Take 3 of the SB attempt:
# take 2 established Mosaic rejects lane blocks narrower than 128, so the
# valid SB=8 point is TILE=128 = 1024 envs/block (~23 MiB scratch).
# B=8192 matches the tile-sweep geometry, so numbers compare directly to
# the SB=1 TILE=128 baseline (151.1k env steps/s, results/tile_sweep_tpu.log).
# Runs from the /tmp/sbwt2 worktree (branch megastep-sb, rebased on main)
# so the queue's main tree never sees WIP kernel code — the round-4
# lesson. Gated on the interpret-mode equivalence test having PASSED
# (/tmp/sb_test_passed written by the session after pytest finishes).
set -u
cd "$(dirname "$0")/.."
if [ "$(date +%s)" -gt "$(date -d 'today 16:05' +%s)" ]; then
  echo "past 16:05 — leaving the chip for the driver"; exit 0
fi
if [ ! -d /tmp/sbwt2 ]; then echo "no /tmp/sbwt2 worktree; skip"; exit 0; fi
if [ ! -f /tmp/sb_test_passed ]; then
  echo "SB equivalence test not confirmed passed; skip"; exit 0
fi
cd /tmp/sbwt2
START=$(date +%s)
echo "=== SB take-3 A/B $(date '+%H:%M:%S')"
# baseline first so both numbers come from the same session/day
PFPN_MEGASTEP_SB=1 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  timeout -k 30 900 python tools/sb_smoke.py || echo "FAILED sb=1 baseline"
sleep 60
PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  timeout -k 30 1200 python tools/sb_smoke.py || echo "FAILED sb=8 tile=128"
LEFT=$(( 2520 - ($(date +%s) - START) ))
if [ "$LEFT" -gt 500 ]; then
  sleep 60
  PFPN_MEGASTEP_SB=4 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
    timeout -k 30 $((LEFT - 60)) python tools/sb_smoke.py \
    || echo "FAILED sb=4 tile=128"
fi
echo "=== SB take-3 A/B done $(date '+%H:%M:%S')"
