#!/bin/bash
# Extra job: rerun the tile=256 megastep point once with the round-5
# fail-fast bench (VERDICT r4 item 3 tail) — capture either a clean
# number or the actual compile/VMEM traceback that the round-4 sweep's
# retry/backoff swallowed. Single short run; sb_smoke prints lower and
# Mosaic compile times separately, so a hang is attributable.
set -u
cd "$(dirname "$0")/.."
if [ "$(date +%s)" -gt "$(date -d 'today 16:10' +%s)" ]; then
  echo "past 16:10 — leaving the chip for the driver"; exit 0
fi
if [ -d /tmp/sbwt2 ]; then cd /tmp/sbwt2; fi
JAX_TRACEBACK_FILTERING=off PFPN_MEGASTEP_SB=1 PFPN_MEGASTEP_TILE=256 \
  SB_SMOKE_B=8192 timeout -k 30 1500 python tools/sb_smoke.py \
  || echo "tile=256 rc=$? (timeout 1500s = compile hang; traceback above otherwise)"
