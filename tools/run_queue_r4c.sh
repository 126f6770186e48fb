#!/bin/bash
# Round-4c serialized TPU queue — reruns the two phase-G DDPG jobs that
# run_queue_r4b.sh lost to an uncommitted WIP kernel edit in the working
# tree (Mosaic rejected a (n,n_cand)->(n,n_cand,1,1) shape cast; the WIP
# was stashed and the proven kernel restored before phase H launched).
# Waits for r4b to release the single-client tunnel (CLAUDE.md caveat 1).
# Usage: nohup bash tools/run_queue_r4c.sh > /tmp/queue_r4c.out 2>&1 &
set -u
cd "$(dirname "$0")/.."

QLOG=results/queue_r4c.log
# round wall-clock ends ~07:14 UTC; leave the driver ~55 min of free TPU
DEADLINE=${PFPN_QUEUE_DEADLINE:-$(date -d 'tomorrow 06:20' +%s)}
NOW=$(date +%s)
if [ $((DEADLINE - NOW)) -gt 86400 ]; then DEADLINE=$((DEADLINE - 86400)); fi

note() { echo "=== $(date '+%H:%M:%S') $*" >> "$QLOG"; }

if [ -f /tmp/queue_r4b.pid ]; then
  note "waiting for run_queue_r4b.sh (pid $(cat /tmp/queue_r4b.pid)) to finish"
  while kill -0 "$(cat /tmp/queue_r4b.pid)" 2>/dev/null; do sleep 60; done
fi
note "r4b queue done; tunnel cooldown"
sleep 180

run() {
  local log="$1"; shift
  local tries=0 rc
  while :; do
    local left=$(( DEADLINE - $(date +%s) ))
    if [ "$left" -le 600 ]; then note "SKIP $log (past deadline)"; return 99; fi
    note "START $log (try $tries, ${left}s left)"
    timeout -k 60 "$left" "$@" >> "$log" 2>&1
    rc=$?
    note "END $log rc=$rc"
    tries=$((tries + 1))
    if [ $rc -ne 43 ] || [ $tries -ge 6 ]; then break; fi
    sleep 300
  done
  sleep 150
  extra_job
  return $rc
}

extra_job() {
  if [ -x tools/extra_job.sh ]; then
    note "EXTRA JOB start"
    timeout -k 60 2400 bash tools/extra_job.sh >> results/extra_job_tpu.log 2>&1
    note "EXTRA JOB rc=$?"
    mv tools/extra_job.sh tools/extra_job.done.sh
    sleep 150
  fi
}

# ---- G'. DDPG validation depth (rerun of r4b phase G) ----
note "PHASE G': ddpg validation rerun"
run results/ddpg_gauss_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 --train
run results/ddpg_pfpn35_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_pfpn \
    --particles 35 --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 --train

# ---- L. Punch exactgeom third seed (if time remains) ----
note "PHASE L: punch exactgeom seed 28949"
run results/dppo_pfpn35_punch_seed28949_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicPunch-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 28949 --suffix exactgeom --train

note "QUEUE r4c DONE"
