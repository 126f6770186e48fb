#!/bin/bash
# Injected job: the SB=4 point (half the sublane batch, half the VMEM
# scratch of SB=8) — only informative if job_1 ran; kept separate so the
# drain loop's 2700 s cap applies per configuration.
set -u
cd "$(dirname "$0")/.."
echo "=== SB4 $(date '+%H:%M:%S')"
PFPN_MEGASTEP_SB=4 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  JAX_TRACEBACK_FILTERING=off \
  timeout -k 30 1200 python tools/sb_smoke.py || echo "FAILED sb=4 tile=128 rc=$?"
echo "=== SB4 done $(date '+%H:%M:%S')"
