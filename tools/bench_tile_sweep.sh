#!/bin/bash
# Sweep PFPN_MEGASTEP_TILE (megastep batch lanes per grid step) over the
# real TPU and print one bench.py JSON line per value. Run ONLY when no
# other process owns the tunnel (CLAUDE.md TPU caveat 1); ~2 min per point.
# If a non-default tile wins by a repeatable margin, make it the default in
# ops/megastep.py (the driver runs plain `python bench.py` with no env).
set -u
cd "$(dirname "$0")/.."
for tile in 128 256 512 1024; do
  echo "--- PFPN_MEGASTEP_TILE=$tile"
  PFPN_MEGASTEP_TILE=$tile timeout 900 python bench.py || echo "FAILED tile=$tile"
  sleep 30
done
