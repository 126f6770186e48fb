#!/bin/bash
# Round-4b serialized TPU queue — follow-up to run_queue_r4.sh (waits for
# it to release the single-client tunnel, CLAUDE.md caveat 1).
# Priority order = what round 4 still leaves open after the r4 queue:
#   G. DDPG validation depth (the one remaining "partial" component,
#      VERDICT r3 #25): real mult16 5M runs for ddpg_gauss + ddpg_pfpn
#   H. Walk exactgeom seeds 12831 + 39907 (complete the 5-seed table,
#      VERDICT item 2 "ideally all 5 of benchmark.sh")
#   I. Punch exactgeom seed 33406 (second-task seed robustness)
#   J. Kick exactgeom seed 28949 (third Kick seed)
#   K. sac_gauss resume 5M -> 15M (full reference budget), deadline-
#      bounded so the TPU is free for the driver's end-of-round bench
# Usage: nohup bash tools/run_queue_r4b.sh > /tmp/queue_r4b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."

QLOG=results/queue_r4b.log
# round wall-clock ends ~07:14 UTC; leave the driver ~55 min of free TPU
DEADLINE=${PFPN_QUEUE_DEADLINE:-$(date -d 'tomorrow 06:20' +%s)}
# if 06:20 is less than 12h away "tomorrow" may overshoot; clamp to <24h
NOW=$(date +%s)
if [ $((DEADLINE - NOW)) -gt 86400 ]; then DEADLINE=$((DEADLINE - 86400)); fi

note() { echo "=== $(date '+%H:%M:%S') $*" >> "$QLOG"; }

# wait for the r4 queue (and any trainer it spawned) to exit
if [ -f /tmp/queue_r4.pid ]; then
  note "waiting for run_queue_r4.sh (pid $(cat /tmp/queue_r4.pid)) to finish"
  while kill -0 "$(cat /tmp/queue_r4.pid)" 2>/dev/null; do sleep 60; done
fi
note "r4 queue done; tunnel cooldown"
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
    # rc=43: stall watchdog — relaunch resumes from the latest checkpoint
    if [ $rc -ne 43 ] || [ $tries -ge 6 ]; then break; fi
    sleep 300
  done
  sleep 150
  extra_job
  return $rc
}

# between-phase hook: if tools/extra_job.sh appears (e.g. a kernel-variant
# measurement prepared while the queue was training), run it once on the
# freed tunnel, then archive it so it does not repeat
extra_job() {
  if [ -x tools/extra_job.sh ]; then
    note "EXTRA JOB start"
    timeout -k 60 2400 bash tools/extra_job.sh >> results/extra_job_tpu.log 2>&1
    note "EXTRA JOB rc=$?"
    mv tools/extra_job.sh tools/extra_job.done.sh
    sleep 150
  fi
}

# ---- G. DDPG validation depth (mult16 = the SAC-validated geometry) ----
note "PHASE G: ddpg validation"
run results/ddpg_gauss_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 --train
run results/ddpg_pfpn35_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_pfpn \
    --particles 35 --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 --train

# ---- H. Walk exactgeom: complete the 5-seed table ----
note "PHASE H: walk exactgeom seeds 12831 + 39907"
run results/dppo_pfpn35_walk_seed12831_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 12831 --suffix exactgeom --train
run results/dppo_pfpn35_walk_seed39907_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 39907 --suffix exactgeom --train

# ---- I. Punch exactgeom second seed ----
note "PHASE I: punch exactgeom seed 33406"
run results/dppo_pfpn35_punch_seed33406_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicPunch-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 33406 --suffix exactgeom --train

# ---- J. Kick exactgeom third seed ----
note "PHASE J: kick exactgeom seed 28949"
run results/dppo_pfpn35_kick_seed28949_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 28949 --suffix exactgeom --train

# ---- K. sac_gauss 5M -> 15M (resumes from the phase-C checkpoint) ----
note "PHASE K: sac_gauss 15M (deadline-bounded)"
run results/sac_gauss_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 15000000 --save_checkpoint_interval 100000 --train

note "QUEUE r4b DONE"
