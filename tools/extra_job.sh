#!/bin/bash
# One-shot TPU smoke for the megastep sublane-batch (SB) branch, take 3.
# Take 2 (results/extra_job_tpu.log) established that Mosaic rejects lane
# blocks narrower than 128, so SB>1 cannot keep 128 envs/block: the valid
# SB=8 point is TILE=128 = 1024 envs/block (scratch 22.8 MiB, fits v5e's
# 128 MiB VMEM; computed from MegaMeta n=34 K=16 R=56). B=8192 matches
# the tile-sweep geometry so the number is directly comparable to the
# SB=1 TILE=128 baseline of 151.1k env steps/s
# (results/tile_sweep_tpu.log). If budget remains, also SB=4 TILE=128
# (512 envs/block, 11.4 MiB scratch).
# Runs from the /tmp/sbwt worktree (branch megastep-sb) so the queue's
# working tree never sees WIP kernel code. Invoked by the
# run_queue_r4*.sh extra_job hook in an inter-job tunnel gap (2400 s cap).
set -u
if [ ! -d /tmp/sbwt ]; then echo "no /tmp/sbwt worktree; skip"; exit 0; fi
cd /tmp/sbwt
START=$(date +%s)
echo "=== SB take-3 smoke $(date '+%H:%M:%S')"
PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 timeout -k 30 1500 \
  python tools/sb_smoke.py || echo "FAILED sb=8 tile=128"
sleep 120
LEFT=$(( 2250 - ($(date +%s) - START) ))
if [ "$LEFT" -gt 500 ]; then
  PFPN_MEGASTEP_SB=4 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
    timeout -k 30 "$LEFT" python tools/sb_smoke.py \
    || echo "FAILED sb=4 tile=128"
fi
echo "=== SB take-3 smoke done $(date '+%H:%M:%S')"
