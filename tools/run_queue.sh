#!/bin/bash
# Serialized TPU training queue (single-client tunnel: CLAUDE.md caveat 1).
# Runs the round-3 result backlog one job at a time, logging to results/.
# Usage: bash tools/run_queue.sh <phase>
#   phase short: exact-geometry Walk+Punch + seed table + preset smokes
#   phase sac:   resume SAC Walk toward the 15M reference budget
set -u
cd "$(dirname "$0")/.."

run() {
  # Retries while the trainer exits with the stall-watchdog code (43,
  # pfpn_tpu/harness/watchdog.py): the relaunch resumes from the latest
  # checkpoint, turning a hung tunnel into a bounded restart.
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
    sleep 300   # post-stall tunnel cooldown before resuming
  done
  # tunnel cooldown between jobs (single-client backend)
  sleep 150
  return $rc
}

phase="${1:-short}"

if [ "$phase" = "short" ]; then
  # 1) exact reference geometry (env_multiplier=1: 8 envs x unroll 512,
  #    minibatch 256 = deepmimic_dppo_base.py:6-11), Walk + Punch, 15M
  run results/dppo_pfpn35_walk_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_pfpn \
      --particles 35 --seed 34114 --suffix exactgeom --train
  run results/dppo_pfpn35_punch_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicPunch-v0 --setting deepmimic_dppo_pfpn \
      --particles 35 --seed 34114 --suffix exactgeom --train

  # 2) complete the 5-seed Walk table at the validated geometry (mult 8)
  for seed in 28949 12831 39907; do
    run "results/dppo_pfpn35_walk_seed${seed}_tpu.log" \
      python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_pfpn \
        --particles 35 --seed "$seed" --env_multiplier 8 --train
  done

  # 3) smoke-train the last untouched presets (finite losses, rising reward)
  run results/ddpg_gauss_walk_seed34114_smoke_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_gauss \
      --seed 34114 --max_samples 100000 --train
  run results/dppo_dis_walk_seed34114_smoke_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_dppo_dis \
      --particles 10 --seed 34114 --max_samples 500000 --env_multiplier 8 --train
elif [ "$phase" = "sac" ]; then
  # resume the SAC Walk run from the 2M checkpoint toward 15M
  # (deepmimic_sac_base.py:15); bounded by round wall-clock, the log
  # documents wherever it stops
  run results/sac_pfpn35_walk_seed34114_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --max_samples 15000000 --train
elif [ "$phase" = "r3b" ]; then
  # 1) SAC Walk to the full 15M reference budget (deepmimic_sac_base.py:15)
  #    at env_multiplier 16: 16 vmapped envs + 16 batch-256 grad steps per
  #    round — the reference's 1-grad-step-per-sample ratio preserved
  #    (PARITY.md #15); single-env physics is tunnel-latency-bound at
  #    ~140 samples/s, making the 15M budget ~26 h — batched it fits the
  #    round. Short throughput probe first, then the full run (fresh seed
  #    dir via --suffix; checkpoints every 100k grad steps — the 1000-step
  #    reference cadence would mean 15k orbax saves).
  run results/sac_pfpn35_walk_seed34114_mult16_probe_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --suffix mult16 --env_multiplier 16 \
      --max_samples 200000 --save_checkpoint_interval 100000 --train
  run results/sac_pfpn35_walk_seed34114_mult16_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --suffix mult16 --env_multiplier 16 \
      --max_samples 15000000 --save_checkpoint_interval 100000 --train
  # 2) Kick at the exact reference geometry (Walk hit 579/600, Punch is in
  #    the short phase; this completes the three-task exactgeom table)
  run results/dppo_pfpn35_kick_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn \
      --particles 35 --seed 34114 --suffix exactgeom --train
elif [ "$phase" = "r3d" ]; then
  # Recovery sequence after a tunnel stall: re-run Kick exactgeom, resume
  # SAC from its 11.14M checkpoint to the 15M budget, then the multi-task
  # demo. Longer cooldowns — post-crash tunnel reconnects hang when rushed.
  sleep 120
  run results/dppo_pfpn35_kick_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn \
      --particles 35 --seed 34114 --suffix exactgeom --train
  sleep 120
  run results/sac_pfpn35_walk_seed34114_mult16_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --suffix mult16 --env_multiplier 16 \
      --max_samples 15000000 --save_checkpoint_interval 100000 --train
  sleep 120
  # three motion subgraphs compile in the first round — allow extra time
  # before the stall watchdog declares a hang
  run results/dppo_pfpn35_multitask_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicMultiTask-v0 \
      --setting deepmimic_dppo_pfpn --particles 35 --seed 34114 \
      --suffix exactgeom --max_samples 45000000 --stall_timeout 2400 --train
elif [ "$phase" = "r4" ]; then
  # Round-3 continuation after a VM reset wiped the (gitignored) ckpt
  # dirs: the SAC 11.14M checkpoint is gone, so SAC reruns from scratch.
  # Order: Kick exactgeom (completes the 3-task exact-geometry table),
  # multi-task demo, then the long SAC full-budget run.
  sleep 120
  run results/dppo_pfpn35_kick_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn \
      --particles 35 --seed 34114 --suffix exactgeom --train
  sleep 120
  run results/dppo_pfpn35_multitask_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicMultiTask-v0 \
      --setting deepmimic_dppo_pfpn --particles 35 --seed 34114 \
      --suffix exactgeom --max_samples 45000000 --stall_timeout 2400 --train
  sleep 120
  run results/sac_pfpn35_walk_seed34114_mult16b_tpu.log \
    python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_pfpn \
      --particles 35 --seed 34114 --suffix mult16b --env_multiplier 16 \
      --max_samples 15000000 --save_checkpoint_interval 100000 --train
elif [ "$phase" = "r3c" ]; then
  # Multi-task training demo (beyond-reference capability): one PFPN-35
  # policy with a task one-hot learns walk+punch+kick in a single vmapped
  # batch (envs/multitask.py). Exact reference update geometry; budget
  # 45M = the reference's 15M per task.
  run results/dppo_pfpn35_multitask_seed34114_exactgeom_tpu.log \
    python -m pfpn_tpu --env DeepMimicMultiTask-v0 \
      --setting deepmimic_dppo_pfpn --particles 35 --seed 34114 \
      --suffix exactgeom --max_samples 45000000 --train
fi
echo "=== $(date '+%H:%M:%S') QUEUE $phase DONE" >> results/queue_r3.log
