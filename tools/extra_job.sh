#!/bin/bash
# One-shot TPU smoke for the megastep sublane-batch (SB) branch, take 2.
# The first take burned its 1000 s/leg budget on four fresh compiles and
# only proved the smoke was too ambitious. This take runs ONE decisive
# configuration: SB=8 TILE=16 = 128 envs/block — the same block size as
# the proven SB=1 TILE=128 config (tile sweep: 256+ envs/block fails
# Mosaic compile), with 8x sublane occupancy. Lower/compile are timed
# separately so a timeout still tells us where the budget went.
# Runs from the /tmp/sbwt worktree (branch megastep-sb) so the queue's
# working tree is never exposed to WIP kernel code.
set -u
if [ ! -d /tmp/sbwt ]; then echo "no /tmp/sbwt worktree; skip"; exit 0; fi
cd /tmp/sbwt
echo "=== SB smoke take2 $(date '+%H:%M:%S')"
PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=16 timeout 2100 python tools/sb_smoke.py \
  || echo "FAILED sb=8 tile=16"
echo "=== SB smoke take2 done $(date '+%H:%M:%S')"
