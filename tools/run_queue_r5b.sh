#!/bin/bash
# Round-5b serialized TPU queue — restarted after the VM reboot killed
# run_queue_r5.sh mid-phase-E (the queue's A-D results are committed; the
# sac_gauss 15M run and all phase-F extras never executed, and the SB
# worktree + gate files in /tmp were lost).
#
# Spine (CLAUDE.md caveat 1: single TPU client, strictly serialized):
#   gate  wait for the tunnel to answer (caveat 6: the relay can be dead
#         for hours and cannot be restarted from inside this box)
#   P1/P2 train-round wall-clock profiles, exactgeom + mult8 (VERDICT item 4)
#   E     sac_gauss to the full 15M reference budget (VERDICT item 5)
#   drain injected jobs tools/queue_r5b_job_*.sh until the deadline
#         (SB A/B + tile-256 land here once the CPU-side kernel work
#         passes the interpret-mode equivalence tests)
#
# run() classifies failures (VERDICT item 3): rc=43 stall-watchdog and
# transient tunnel signatures retry with cooldown; compile/Mosaic/OOM
# signatures fail FAST with the traceback tail recorded in the queue log.
#
# Usage: nohup bash tools/run_queue_r5b.sh > /tmp/queue_r5b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."

QLOG=results/queue_r5b.log
# round wall-clock: reboot at 23:44 UTC Aug 20 + ~7h => ends ~06:44;
# leave the driver ~50 min of free TPU for bench.py + dryrun
DEADLINE=${PFPN_QUEUE_DEADLINE:-$(date -d '2026-08-21 05:55' +%s)}

note() { echo "=== $(date '+%H:%M:%S') $*" >> "$QLOG"; }

FATAL_RE='Mosaic failed to compile|failed to legalize|infer-vector-layout|RESOURCE_EXHAUSTED|XlaRuntimeError: INTERNAL: Mosaic|ModuleNotFoundError|SyntaxError|AttributeError|TypeError|assert'
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

# ---- gate: wait for the tunnel (caveat 6) ------------------------------
note "GATE: probing tunnel (reboot killed the previous queue mid-sac)"
while :; do
  if [ $(( DEADLINE - $(date +%s) )) -le 1200 ]; then
    note "GATE: deadline reached while tunnel dead — giving up"; exit 1
  fi
  if timeout -s KILL 90 python -c "
import jax, jax.numpy as jnp
assert float(jax.jit(lambda a: (a*a).sum())(jnp.arange(64.0))) == 85344.0
" >/dev/null 2>&1; then
    note "GATE: tunnel alive — settling 120s"
    sleep 120
    break
  fi
  sleep 240
done

# ---- P1/P2: train-round profiles (VERDICT item 4) ----------------------
note "PHASE P1: train-round profile exactgeom (mult 1)"
timeout -k 60 2700 python tools/profile_train_round.py --mult 1 \
  --rounds 4 --evals 2 >> results/profile_train_round_exactgeom.log 2>&1
note "PHASE P1 rc=$?"
sleep 150
note "PHASE P2: train-round profile mult8"
timeout -k 60 2700 python tools/profile_train_round.py --mult 8 \
  --rounds 4 --evals 2 >> results/profile_train_round_mult8.log 2>&1
note "PHASE P2 rc=$?"
sleep 150

# ---- E: sac_gauss to the full 15M reference budget (VERDICT item 5) ----
note "PHASE E: sac_gauss 15M mult16 (restart after reboot; ckpt resumes)"
run results/sac_gauss_walk_seed34114_mult16_15M_tpu.log \
  python -m pfpn_tpu --env DeepMimicWalk-v0 --setting deepmimic_sac_gauss \
    --seed 34114 --suffix mult16 --env_multiplier 16 \
    --max_samples 15000000 --save_checkpoint_interval 500000 \
    --stall_timeout 600 \
    --train

# ---- drain: injected jobs until the deadline ---------------------------
note "DRAIN: polling tools/queue_r5b_job_*.sh"
while [ $(( DEADLINE - $(date +%s) )) -gt 900 ]; do
  found=0
  for j in tools/queue_r5b_job_*.sh; do
    [ -e "$j" ] || continue
    found=1
    note "JOB $j start"
    left=$(( DEADLINE - $(date +%s) ))
    cap=$(( left < 2700 ? left : 2700 ))
    timeout -k 60 "$cap" bash "$j" >> "results/$(basename "$j" .sh)_tpu.log" 2>&1
    note "JOB $j rc=$?"
    mv "$j" "$j.done"
    sleep 150
  done
  [ "$found" = 1 ] || sleep 120
done

note "QUEUE r5b DONE"
