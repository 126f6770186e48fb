#!/bin/bash
# Round-5 serialized TPU queue (CLAUDE.md caveat 1: single client only).
#
# Order per VERDICT.md round-5 items: DDPG validation FIRST from a clean
# committed tree (items 1), then the Punch exactgeom seed table (item 2),
# then sac_gauss to the full 15M reference budget (item 5).
#
# run() now classifies failures instead of treating every nonzero rc the
# same (VERDICT item 3): rc=43 (stall watchdog) and transient-tunnel
# signatures retry with a cooldown; compile/Mosaic/OOM signatures are
# deterministic — fail FAST, record the traceback tail in the queue log,
# and move on to the next job instead of burning the budget on retries.
#
# Usage: nohup bash tools/run_queue_r5.sh > /tmp/queue_r5.out 2>&1 &
set -u
cd "$(dirname "$0")/.."

QLOG=results/queue_r5.log
# round wall-clock ends ~17:20 UTC; leave the driver ~50 min of free TPU
DEADLINE=${PFPN_QUEUE_DEADLINE:-$(date -d 'today 16:30' +%s)}
NOW=$(date +%s)
if [ $((DEADLINE - NOW)) -le 0 ]; then DEADLINE=$((DEADLINE + 86400)); fi

note() { echo "=== $(date '+%H:%M:%S') $*" >> "$QLOG"; }

# Deterministic failure signatures: retrying these can never succeed.
FATAL_RE='Mosaic failed to compile|failed to legalize|infer-vector-layout|RESOURCE_EXHAUSTED|XlaRuntimeError: INTERNAL: Mosaic|ModuleNotFoundError|SyntaxError|AttributeError|TypeError|assert'
# Transient tunnel signatures (CLAUDE.md caveats 1/6): worth a cooldown+retry.
TRANSIENT_RE='TPU backend error|Socket closed|UNAVAILABLE|DEADLINE_EXCEEDED|Connection reset|connection error|tunnel|Remote terminal'

classify() {  # $1 = log file -> echoes fatal|transient|unknown
  local tail_txt
  tail_txt=$(tail -c 20000 "$1" 2>/dev/null)
  if echo "$tail_txt" | grep -qE "$FATAL_RE"; then echo fatal; return; fi
  if echo "$tail_txt" | grep -qE "$TRANSIENT_RE"; then echo transient; return; fi
  echo unknown
}

run() {
  local log="$1"; shift
  local tries=0 rc kind
  while :; do
    local left=$(( DEADLINE - $(date +%s) ))
    if [ "$left" -le 600 ]; then note "SKIP $log (past deadline)"; return 99; fi
    note "START $log (try $tries, ${left}s left)"
    timeout -k 60 "$left" "$@" >> "$log" 2>&1
    rc=$?
    tries=$((tries + 1))
    if [ $rc -eq 0 ]; then note "END $log rc=0"; break; fi
    if [ $rc -eq 43 ]; then
      note "END $log rc=43 (stall watchdog) — retry, resumes from ckpt"
      if [ $tries -ge 6 ]; then note "GIVE UP $log (6 stall retries)"; break; fi
      sleep 300; continue
    fi
    kind=$(classify "$log")
    note "END $log rc=$rc class=$kind"
    if [ "$kind" = fatal ]; then
      note "FATAL $log — deterministic failure, NOT retrying. Traceback tail:"
      tail -n 25 "$log" | sed 's/^/    /' >> "$QLOG"
      break
    elif [ "$kind" = transient ] && [ $tries -lt 4 ]; then
      note "TRANSIENT $log — cooldown 300s then retry"
      sleep 300; continue
    else
      note "STOP $log (class=$kind, tries=$tries) — failing fast"
      tail -n 15 "$log" | sed 's/^/    /' >> "$QLOG"
      break
    fi
  done
  sleep 150
  return $rc
}

# ---- A. DDPG validation (VERDICT item 1; third attempt, first in queue) ----
note "PHASE A: ddpg_gauss 5M mult16"
run results/ddpg_gauss_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 \
    --train

note "PHASE B: ddpg_pfpn 5M mult16"
run results/ddpg_pfpn35_walk_seed34114_mult16_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_ddpg_pfpn \
    --particles 35 --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 5000000 --save_checkpoint_interval 100000 \
    --train

# ---- C/D. Punch exactgeom seed table (VERDICT item 2) ----
note "PHASE C: punch exactgeom seed 33406 (full rerun, ckpt gone)"
run results/dppo_pfpn35_punch_seed33406_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicPunch-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 33406 --suffix exactgeom --train

note "PHASE D: punch exactgeom seed 28949"
run results/dppo_pfpn35_punch_seed28949_exactgeom_tpu.log \
  python -m pfpn_tpu --env DeepMimicPunch-v0 --setting deepmimic_dppo_pfpn \
    --particles 35 --seed 28949 --suffix exactgeom --train

# ---- E. sac_gauss to the full 15M reference budget (VERDICT item 5) ----
# fresh log: the r4 log is a *finished* 5M-budget run; this is a new run
# from scratch (ckpt_*/ does not survive rounds), not a resume of it
note "PHASE E: sac_gauss 15M mult16"
run results/sac_gauss_walk_seed34114_mult16_15M_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 15000000 --save_checkpoint_interval 500000 \
    --train

# ---- F. optional injected jobs written while the queue ran ----
for j in tools/queue_r5_extra_*.sh; do
  [ -e "$j" ] || continue
  note "EXTRA JOB $j start"
  timeout -k 60 2700 bash "$j" >> "results/$(basename "$j" .sh)_tpu.log" 2>&1
  note "EXTRA JOB $j rc=$?"
  mv "$j" "$j.done"
  sleep 150
done

note "QUEUE r5 DONE"
