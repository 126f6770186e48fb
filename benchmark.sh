#!/usr/bin/env bash
# Benchmark launcher with the reference's seed-index mapping
# (reference benchmark.sh:11,18):
#   bash benchmark.sh <env> <setting> <particles> <seed-idx> [--train ...]
set -e

SEEDS=(34114 33406 28949 12831 39907)

ENV=$1
SETTING=$2
PARTICLES=$3
SEED_IDX=$4
shift 4

exec python -m pfpn_tpu \
    --env "$ENV" --setting "$SETTING" \
    --particles "$PARTICLES" --seed "${SEEDS[$SEED_IDX]}" "$@"
