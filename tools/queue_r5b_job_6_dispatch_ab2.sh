#!/bin/bash
# Injected job: A/B the rounds_per_dispatch host-overhead fix
# (TRAIN_PROFILE.md) on a real short training run. Geometry = the mult8
# profile (B=64, minibatch 2048). Steady-state rate is computed from the
# metrics.jsonl time stamps over the second half of each run, so compile
# time does not pollute the comparison. eval stays at the default /50
# cadence so the measured loop is the production loop.
set -u
cd "$(dirname "$0")/.."
SCRATCH=/tmp/dispatch_ab2
rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"

measure() {  # $1 = rounds_per_dispatch  $2 = suffix
  echo "=== dispatch A/B R=$1 $(date '+%H:%M:%S')"
  timeout -k 30 1000 python -m pfpn_tpu --env DeepMimicWalk-v0 \
    --setting deepmimic_dppo_pfpn --particles 35 --seed 34114 \
    --suffix "$2" --env_multiplier 8 --max_samples 3000000 \
    --save_checkpoint_interval 100000000 --stall_timeout 600 \
    --rounds_per_dispatch "$1" --root "$SCRATCH" --train \
    || echo "R=$1 run rc=$?"
  python - "$SCRATCH/log_DeepMimicWalk-v0/deepmimic_dppo_pfpn_particle35_$2/34114/metrics.jsonl" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
tr = [r for r in rows if "train/total_samples" in r]
a, b = tr[len(tr)//2], tr[-1]
ds = b["train/total_samples"] - a["train/total_samples"]
dt = b["time"] - a["time"]
print(f"STEADY {ds/dt:,.0f} samples/s over last {len(tr)-len(tr)//2} rounds "
      f"({ds:.0f} samples in {dt:.1f}s)")
EOF
  sleep 120
}

measure 1 abR1
measure 5 abR5
echo "=== dispatch A/B done $(date '+%H:%M:%S')"
