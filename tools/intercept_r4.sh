#!/bin/bash
# Borrow the r4 queue's inter-job TPU gap: when the multi-task job ends
# cleanly (rc=0), the queue sleeps 150s+120s before starting the SAC job —
# stop it there, run the megastep tile sweep + an env-step profile on the
# freed chip, then hand the TPU to the SAC-only continuation queue
# (tools/run_queue2.sh r4c). If the multi-task job stalls (rc=43), the
# queue's own retry loop keeps the TPU and this watcher stays armed.
set -u
cd "$(dirname "$0")/.."

# fire only when a clean END follows the MOST RECENT START for the
# multi-task log: queue_r3.log is append-only across phases and earlier
# phases reuse the same log filename, so a bare grep could match a stale
# line and kill the queue while a trainer still owns the TPU
mt_done() {
  awk '
    /START results\/dppo_pfpn35_multitask_seed34114_exactgeom_tpu.log/ {s=NR; e=0}
    /END results\/dppo_pfpn35_multitask_seed34114_exactgeom_tpu.log rc=0/ {if (s && NR>s) e=NR}
    END {exit !(e)}
  ' results/queue_r3.log
}
while ! mt_done; do
  sleep 60
done

echo "=== $(date '+%H:%M:%S') INTERCEPT: multitask done; stopping r4 queue" \
  >> results/queue_r3.log
kill "$(cat /tmp/queue_r4.pid)" 2>/dev/null
sleep 180  # tunnel cooldown after the trainer exited (CLAUDE.md caveat 1)

bash tools/bench_tile_sweep.sh > results/tile_sweep_tpu.log 2>&1
sleep 60
# multi-task batch throughput (BASELINE "4096 vmapped multi-task envs")
PFPN_BENCH_ENV=DeepMimicMultiTask-v0 PFPN_BENCH_BATCH=4096 \
  timeout 900 python bench.py > results/bench_multitask_tpu.log 2>&1
sleep 60
# A/B the kernel-emitted link states (ops/megastep.py emit_links — skips
# the env-step fk+link_states epilogue; flip the default if this wins)
PFPN_MEGASTEP_LINKS=1 timeout 900 python bench.py \
  > results/bench_links_tpu.log 2>&1
sleep 60
timeout 900 python tools/profile_envstep.py > results/profile_envstep_r3.log 2>&1
sleep 120

nohup bash tools/run_queue2.sh r4c > /tmp/queue_r4c.out 2>&1 &
echo $! > /tmp/queue_r4c.pid
echo "=== $(date '+%H:%M:%S') INTERCEPT: sweep+profile done; r4c started" \
  >> results/queue_r3.log
