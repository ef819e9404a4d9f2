#!/usr/bin/env bash
# Round close-out (r8 verdict ask #9): regenerate every artifact that
# depends on the FULL query registry, so a query added in the round's
# final commits can never miss the audit/pin the way round-8's
# lexical_hard_negatives did.  Run this LAST, commit its outputs, and
# land nothing after that commit.
#
# Usage: tools/close_round.sh [N_BENCH_RUNS]
#   1. plan audit  -> PLAN_AUDIT.md   (forbidden nodes + gwin gate; exits
#                                      non-zero on a flag, aborting close)
#   2. lineage     -> LINEAGE.md
#   3. N idle bench runs at sf0.1 -> tools/pin_baseline.py -> BENCH_BASELINE.json
#      (run on an IDLE host: concurrent load inflates per-query medians)
#   4. pointer audit (tests/test_pointer_audit.py)
set -euo pipefail
cd "$(dirname "$0")/.."

RUNS="${1:-3}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

echo "== [1/4] plan audit (PLAN_AUDIT.md)"
python tools/plan_audit.py /root/testdata/sf0.01 --md PLAN_AUDIT.md

echo "== [2/4] lineage (LINEAGE.md)"
python tools/lineage.py /root/testdata/sf0.01 --md LINEAGE.md

echo "== [3/4] ${RUNS} idle bench run(s) at ${SF_DIR} -> re-pin"
DETAILS=()
for i in $(seq 1 "$RUNS"); do
  out="/tmp/close_round_bench_${i}.json"
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_DETAIL="$out" \
    python bench.py 2>/dev/null
  DETAILS+=("$out")
done
python tools/pin_baseline.py "${DETAILS[@]}" \
  --note "close_round.sh: ${RUNS} idle runs at ${SF_DIR}"

echo "== [3b/4] pin-completeness guard (r9 verdict ask #3)"
# The snapshot commit must not pass with a stale pin: every registry
# query needs a row in the freshly-written BENCH_BASELINE.json.
python - <<'PY'
import json, sys
from d2b_dataframework_spark.plans.queries import REGISTRY
pin = set(json.load(open("BENCH_BASELINE.json"))["queries"])
missing = set(REGISTRY) - pin
stale = pin - set(REGISTRY)
if missing or stale:
    sys.exit(f"PIN INCOMPLETE: missing={sorted(missing)} stale={sorted(stale)}")
print(f"pin covers all {len(pin)} registry queries")
PY

echo "== [4/4] pointer audit"
python -m pytest tests/test_pointer_audit.py -x -q

echo "close_round: done — commit PLAN_AUDIT.md LINEAGE.md BENCH_BASELINE.json"
