#!/bin/bash
# Injected job: SB=4 TILE=128 retry on the DEFAULT scoped-VMEM budget
# after the a_scr elimination (job_5 measured 17.06 MiB vs the 16 MiB
# limit; dropping the (3K,3K,4,128) Delassus scratch removes ~4.7 MiB).
# A clean number here means sb=4 is deployable without compiler flags.
set -u
cd "$(dirname "$0")/.."
echo "=== SB4 retry $(date '+%H:%M:%S') HEAD=$(git rev-parse --short HEAD)"
PFPN_MEGASTEP_SB=4 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  JAX_TRACEBACK_FILTERING=off \
  timeout -k 30 2400 python tools/sb_smoke.py || echo "FAILED sb=4 retry rc=$?"
echo "=== SB4 retry done $(date '+%H:%M:%S')"
