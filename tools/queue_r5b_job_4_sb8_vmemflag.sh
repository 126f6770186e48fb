#!/bin/bash
# Injected job: SB=8 TILE=128 retry with the scoped-VMEM limit raised.
# job_1 established the precise failure: "Scoped allocation with size
# 26.50M and limit 16.00M exceeded scoped vmem limit by 10.50M" — the
# kernel's rank-4 scratch (~26.5 MiB at sb=8, tile=128) exceeds XLA's
# default 16 MiB scoped-vmem budget, NOT the chip's 128 MiB VMEM.
# --xla_tpu_scoped_vmem_limit_kib raises the budget (trades against
# XLA's own pipelining headroom); 64 MiB leaves the other half for the
# in/out pipeline buffers.
set -u
cd "$(dirname "$0")/.."
echo "=== SB8 vmemflag $(date '+%H:%M:%S')"
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  SB_SMOKE_VMEM_KIB=65536 \
  PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  JAX_TRACEBACK_FILTERING=off \
  timeout -k 30 2400 python tools/sb_smoke.py || echo "FAILED sb=8 vmemflag rc=$?"
echo "=== SB8 vmemflag done $(date '+%H:%M:%S')"
