#!/bin/bash
# One-shot TPU smoke for the megastep sublane-batch (SB) branch.
# Runs from the /tmp/sbwt worktree (branch megastep-sb) so the queue's
# working tree is never exposed to WIP kernel code. Invoked by the
# run_queue_r4*.sh extra_job hook in an inter-phase tunnel gap.
set -u
if [ ! -d /tmp/sbwt ]; then echo "no /tmp/sbwt worktree; skip"; exit 0; fi
cd /tmp/sbwt
echo "=== SB smoke $(date '+%H:%M:%S')"
for sb in 1 8; do
  echo "--- PFPN_MEGASTEP_SB=$sb"
  PFPN_MEGASTEP_SB=$sb timeout 1000 python tools/sb_smoke.py \
    || echo "FAILED sb=$sb"
  sleep 60
done
echo "=== SB smoke done $(date '+%H:%M:%S')"
