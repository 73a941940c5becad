#!/usr/bin/env bash
# Full sf0.1 oracle sweep — the beyond-the-gate check (driver gate is
# sf0.01). Dumps every registered query at sf0.1 and compares against
# DuckDB. d5/d8 are excluded ONLY because their oracles' recursive-CTE
# connected-components enumerate paths combinatorially in DuckDB at
# sf0.1 edge counts (>1 h CPU oracle-side; Spark side is ~1 s) — both
# stay green at the sf0.01 gate. Round-10 sweep: 100/100 checked green
# after the n8 nprobe fix this sweep caught.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_sweep_sf01}
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT"
SKIP="d5_dup_clusters,d8_quality_keeper"
ALL=$(python3 - "$OUT" "$SKIP" <<'EOF'
import json, sys
oracles = set(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))
print(",".join(sorted(oracles - set(sys.argv[2].split(",")))))
EOF
)
python3 scripts/check.py "$OUT" /root/testdata/sf0.1 "$ALL"
