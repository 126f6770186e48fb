#!/bin/bash
# Injected job: rerun the tile=256 megastep point once with the fail-fast
# smoke tool (VERDICT r4 item 3 tail) — capture either a clean number or
# the actual compile/VMEM traceback that the round-4 sweep's
# retry/backoff swallowed. sb_smoke prints lower and Mosaic compile
# phases separately, so a hang is attributable to a specific phase.
set -u
cd "$(dirname "$0")/.."
echo "=== tile256 $(date '+%H:%M:%S')"
PFPN_MEGASTEP_TILE=256 SB_SMOKE_B=8192 \
  JAX_TRACEBACK_FILTERING=off \
  timeout -k 30 1500 python tools/sb_smoke.py \
  || echo "tile=256 rc=$? (timeout 1500s = hang in the last printed phase; traceback above otherwise)"
echo "=== tile256 done $(date '+%H:%M:%S')"
