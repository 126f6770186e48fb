#!/bin/bash
# Injected job: rerun the exactgeom train-round profile (queue phase P1
# crashed on a transient dirty-tree state: it imported ops/megastep.py in
# the minutes between a WIP sublane-batch edit and its fix — the same
# failure mode as round 4's DDPG queue, caught within one phase this
# time). Numbered 0 so the drain glob runs it first.
set -u
cd "$(dirname "$0")/.."
python tools/profile_train_round.py --mult 1 --rounds 4 --evals 2
