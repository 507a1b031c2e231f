#!/bin/sh
# One-command round-3 measurement pass on the real TPU (run when the axon
# tunnel is up).  Produces, in order:
#   1. kernel microbenches (amortized, dispatch-floor-subtracted)
#   2. the full reference benchmark grid + rooflines -> BENCHGRID.json
#   3. the driver headline line (includes the grid headline set)
set -ex
cd "$(dirname "$0")/.."
python tools/kbench.py 2>&1 | tail -40
python tools/bench_grid.py --out BENCHGRID.json
python bench.py
