#!/bin/bash
# Extra job: driver-methodology bench (bench.py: sim + policy-in-loop)
# for the SB winner. Runs only if the session flagged a configuration:
#   /tmp/sb_merge_done   -> SB already merged to main, plain bench.py
#   /tmp/sb_bench_sb8    -> not merged yet, bench the worktree at SB=8
# Complements extra_3's sb_smoke numbers with the policy-in-loop figure.
set -u
cd "$(dirname "$0")/.."
if [ "$(date +%s)" -gt "$(date -d 'today 16:10' +%s)" ]; then
  echo "past 16:10 — leaving the chip for the driver"; exit 0
fi
if [ -f /tmp/sb_merge_done ]; then
  timeout -k 30 1500 python bench.py
elif [ -f /tmp/sb_bench_sb8 ] && [ -d /tmp/sbwt2 ]; then
  cd /tmp/sbwt2
  PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=128 timeout -k 30 1500 python bench.py
else
  echo "no SB bench flag set; skip"
fi
