#!/bin/bash
# Round-4 serialized TPU queue (single-client tunnel: CLAUDE.md caveat 1).
# Priority order = VERDICT.md r3 "Next round" items:
#   A. perf experiments that never landed in r3 (tile sweep, 4096-env
#      multi-task bench, emit_links A/B, env-step profile)   [item 3]
#   B. the 5 never-trained presets + dppo_dis promote         [item 1]
#   C. sac_gauss (wall-clock-bounded budget, documented)      [item 1]
#   D. Walk exactgeom seeds 33406 + 28949                     [item 2]
#   E. Kick exactgeom second seed (variance check)            [item 5]
#   F. SAC+PFPN full 15M rerun (mult16b; the r3 11.17M ckpt
#      was wiped by a VM reset), deadline-bounded so the TPU
#      is free for the driver's end-of-round bench            [item 4]
# Usage: nohup bash tools/run_queue_r4.sh > /tmp/queue_r4.out 2>&1 &
set -u
cd "$(dirname "$0")/.."

QLOG=results/queue_r4.log
# hard deadline (epoch s) after which no new job starts and the SAC tail
# run is killed: round wall-clock is ~12 h from ~10:04 UTC; leave the
# driver ~50 min of free TPU for bench.py.
DEADLINE=${PFPN_QUEUE_DEADLINE:-$(date -d '21:15' +%s)}

note() { echo "=== $(date '+%H:%M:%S') $*" >> "$QLOG"; }

run() {
  # retry while the trainer exits with the stall-watchdog code (43):
  # the relaunch resumes from the latest checkpoint
  local log="$1"; shift
  local tries=0 rc
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    note "SKIP $log (past deadline)"; return 99
  fi
  while :; do
    note "START $log (try $tries)"
    "$@" >> "$log" 2>&1
    rc=$?
    note "END $log rc=$rc"
    tries=$((tries + 1))
    if [ $rc -ne 43 ] || [ $tries -ge 6 ]; then
      break
    fi
    sleep 300   # post-stall tunnel cooldown before resuming
  done
  sleep 150     # tunnel cooldown between jobs (single-client backend)
  return $rc
}

# ---- A. perf experiments (short; they also inform megastep defaults) ----
note "PHASE A: perf experiments"
run results/tile_sweep_tpu.log bash tools/bench_tile_sweep.sh
run results/bench_multitask_tpu.log env PFPN_BENCH_ENV=DeepMimicMultiTask-v0 \
  PFPN_BENCH_BATCH=4096 timeout 900 python bench.py
run results/bench_links_tpu.log env PFPN_MEGASTEP_LINKS=1 \
  timeout 900 python bench.py
run results/profile_envstep_r4.log timeout 900 python tools/profile_envstep.py

# ---- B. never-trained presets, Walk seed 34114, full 15M budget ----
# env_multiplier matches the validated pfpn-family runs: a3c x8 (128 envs x
# unroll 32), impala x4 (128 envs x unroll 64), dppo x8 (64 envs x 512).
note "PHASE B: preset validation matrix"
run results/a3c_gauss_walk_seed34114_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_a3c_gauss \
    --seed 34114 --env_multiplier 8 --train
run results/a3c_dis_walk_seed34114_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_a3c_dis \
    --particles 35 --seed 34114 --env_multiplier 8 --train
run results/impala_gauss_walk_seed34114_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_impala_gauss \
    --seed 34114 --env_multiplier 4 --train
run results/impala_dis_walk_seed34114_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_impala_dis \
    --particles 35 --seed 34114 --env_multiplier 4 --train
run results/dppo_dis_walk_seed34114_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_dis \
    --particles 35 --seed 34114 --env_multiplier 8 --train

# ---- C. sac_gauss: wall-clock-bounded 5M budget (1 grad step per env
# sample makes 15M SAC samples ~3.5 h; 5M shows the learning curve and
# plateau trend; documented in results/README.md) ----
note "PHASE C: sac_gauss"
run results/sac_gauss_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 --train

# ---- D. Walk exactgeom seed robustness ----
note "PHASE D: walk exactgeom seeds"
run results/dppo_pfpn35_walk_seed33406_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 33406 --suffix exactgeom --train
run results/dppo_pfpn35_walk_seed28949_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 28949 --suffix exactgeom --train

# ---- E. Kick exactgeom second seed (variance vs engine-artifact) ----
note "PHASE E: kick exactgeom seed 33406"
run results/dppo_pfpn35_kick_seed33406_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 33406 --suffix exactgeom --train

# ---- F. SAC+PFPN 15M rerun, deadline-bounded ----
note "PHASE F: sac_pfpn 15M (deadline-bounded)"
tries=0
while :; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 600 ]; then note "SAC: no time left ($left s)"; break; fi
  note "START results/sac_pfpn35_walk_seed34114_mult16b_tpu.log (try $tries, ${left}s left)"
  timeout -k 60 "$left" \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --suffix mult16b --env_multiplier 16 \
      --max_samples 15000000 --save_checkpoint_interval 100000 --train \
    >> results/sac_pfpn35_walk_seed34114_mult16b_tpu.log 2>&1
  rc=$?
  note "END results/sac_pfpn35_walk_seed34114_mult16b_tpu.log rc=$rc"
  tries=$((tries + 1))
  if [ $rc -ne 43 ] || [ $tries -ge 6 ]; then break; fi
  sleep 300
done

note "QUEUE r4 DONE"
