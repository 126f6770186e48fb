#!/bin/bash
# Injected job: SB=8 TILE=128 with the scoped-VMEM budget raised through
# PJRT compiler_options ONLY (job_4's XLA_FLAGS attempt aborted at client
# startup: the local CPU xla rejects the TPU-only flag). Also first run
# of the a_scr-free sb>1 kernel (~9.4 MiB less scoped VMEM at sb=8:
# 26.5 -> ~17.1 needs the raised budget still).
set -u
cd "$(dirname "$0")/.."
echo "=== SB8 copts $(date '+%H:%M:%S') HEAD=$(git rev-parse --short HEAD)"
SB_SMOKE_VMEM_KIB=65536 \
  PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  JAX_TRACEBACK_FILTERING=off \
  timeout -k 30 2400 python tools/sb_smoke.py || echo "FAILED sb=8 copts rc=$?"
echo "=== SB8 copts done $(date '+%H:%M:%S')"
