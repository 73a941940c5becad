#!/usr/bin/env bash
# Full sf0.1 oracle sweep — the beyond-the-gate check (driver gate is
# sf0.01). Dumps every registered query at sf0.1 and compares against
# DuckDB. NO exclusions since round 11: the d5/d8 recursive-CTE
# reachability oracles (combinatorial in DuckDB at sf0.1 edge counts)
# were replaced by bounded min-label + pointer-jump propagation with an
# in-SQL convergence check, so the whole registry sweeps.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_sweep_sf01}
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT"
python3 scripts/check.py "$OUT" /root/testdata/sf0.1
