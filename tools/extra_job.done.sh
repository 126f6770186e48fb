#!/bin/bash
# One-shot TPU smoke for the megastep sublane-batch (SB) branch, take 2:
# single config per process (SB=8 TILE=16 = 128 envs/block, the proven
# block size with 8x sublane occupancy), lower/compile timed separately
# (tools/sb_smoke.py at /tmp/sbwt bfaa46d). The SB=1 TILE=128 baseline
# number already exists: 151.1k steps/s (results/tile_sweep_tpu.log).
# Runs from the /tmp/sbwt worktree (branch megastep-sb) so the queue's
# working tree never sees WIP kernel code. Invoked by the
# run_queue_r4*.sh extra_job hook in an inter-job tunnel gap.
set -u
if [ ! -d /tmp/sbwt ]; then echo "no /tmp/sbwt worktree; skip"; exit 0; fi
cd /tmp/sbwt
echo "=== SB take-2 smoke $(date '+%H:%M:%S')"
PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=16 timeout -k 30 2100 \
  python tools/sb_smoke.py || echo "FAILED sb=8 tile=16"
echo "=== SB take-2 smoke done $(date '+%H:%M:%S')"
