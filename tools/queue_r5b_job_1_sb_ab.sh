#!/bin/bash
# Injected job: megastep sublane-batch A/B on the real chip — VERDICT r4
# item 6 (prototype ONE shape lever, measured). Rebuilt after the reboot
# lost the original take-3 worktree; this take lives on main, flag-gated
# behind PFPN_MEGASTEP_SB (default 1 = historical layout; the sb=1
# lowered program is op-identical to the pre-change kernel, verified by
# jaxpr diff), with an interpret-mode equivalence test
# (tests/test_megastep.py::test_megastep_kernel_sublane_batch_matches_default)
# gating the commit this runs from.
#
# Geometry matches the round-4 tile sweep (B=8192, TILE=128) so numbers
# compare directly to its 151.1k env steps/s SB=1 point
# (results/tile_sweep_tpu.log).
set -u
cd "$(dirname "$0")/.."
echo "=== SB A/B $(date '+%H:%M:%S') HEAD=$(git rev-parse --short HEAD)"
# baseline first so both numbers come from the same session/day
PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  timeout -k 30 900 python tools/sb_smoke.py || echo "FAILED sb=1 baseline rc=$?"
sleep 60
PFPN_MEGASTEP_SB=8 PFPN_MEGASTEP_TILE=128 SB_SMOKE_B=8192 \
  JAX_TRACEBACK_FILTERING=off \
  timeout -k 30 1200 python tools/sb_smoke.py || echo "FAILED sb=8 tile=128 rc=$?"
echo "=== SB A/B done $(date '+%H:%M:%S')"
