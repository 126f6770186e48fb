#!/bin/bash
# Continuation queue for phase r4 (kept out of run_queue.sh because that
# script is being executed by the live r4 queue process — bash scripts
# must not be edited while running). Phase r4c: the SAC full-budget rerun
# only, used after tools/intercept_r4.sh borrows the inter-job TPU gap
# for the megastep tile sweep.
set -u
cd "$(dirname "$0")/.."

run() {
  # retry while the trainer exits with the stall-watchdog code (43):
  # the relaunch resumes from the latest checkpoint
  local log="$1"; shift
  local tries=0 rc
  while :; do
    echo "=== $(date '+%H:%M:%S') START $log (try $tries)" >> results/queue_r3.log
    "$@" >> "$log" 2>&1
    rc=$?
    echo "=== $(date '+%H:%M:%S') END $log rc=$rc" >> results/queue_r3.log
    tries=$((tries + 1))
    if [ $rc -ne 43 ] || [ $tries -ge 6 ]; then
      break
    fi
    sleep 300
  done
  sleep 150
  return $rc
}

phase="${1:-r4c}"

if [ "$phase" = "r4c" ]; then
  run results/sac_pfpn35_walk_seed34114_mult16b_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --suffix mult16b --env_multiplier 16 \
      --max_samples 15000000 --save_checkpoint_interval 100000 --train
fi
echo "=== $(date '+%H:%M:%S') QUEUE2 $phase DONE" >> results/queue_r3.log
