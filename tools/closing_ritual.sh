#!/usr/bin/env bash
# Closing ritual — run before a round's final commit. Encodes the checks
# VERDICT r4/r5/r6 asked to be un-forgettable:
#   1. full pytest (plan-shape gate included) must be green
#   2. raw oracle-sweep logs at sf0.001 / sf0.01 / sf0.1 (committed artifacts)
#   3. PLANS.md + COVERAGE.md regenerated LAST (after the final code edit —
#      the inventory-sync test pins them; r6's line refs drifted because the
#      ritual ran before a late commit)
#   4. bench at sf0.1 -> BENCH_DETAIL.json refreshed, then the bench gate:
#      pins BENCH_CLOSING_<tag>.json as the round's ONE official number
#      (BASELINE.md's narrative must quote it) and FAILS on any query >3×
#      its last committed time (the BASELINE.md outlier rule, automated)
# Usage: tools/closing_ritual.sh [round-tag like r07]
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:-rXX}"

echo "== 1/4 pytest =="
python -m pytest tests/ -q

echo "== 2/4 oracle sweeps =="
python tools/check_oracle.py /root/testdata/sf0.001 > "SWEEP_${TAG}_sf0001.log"
python tools/check_oracle.py /root/testdata/sf0.01  > "SWEEP_${TAG}_sf001.log"
python tools/check_oracle.py /root/testdata/sf0.1   > "SWEEP_${TAG}_sf01.log"
tail -n1 "SWEEP_${TAG}_sf0001.log" "SWEEP_${TAG}_sf001.log" "SWEEP_${TAG}_sf01.log"

echo "== 3/4 inventories (regenerate AFTER the last code edit) =="
python tools/dump_plans.py
python tools/dump_coverage.py
python -m pytest tests/test_inventory_sync.py -q

echo "== 4/6 bench + gate =="
python bench.py
python tools/bench_gate.py "${TAG}"

echo "== 5/6 rotating fresh-process oracle slice (VERDICT r10 #6) =="
python tools/sample_rotate.py "${TAG#r}"

echo "== 6/6 band-skew probe re-pin incl. one-hot twin (VERDICT r10 #7) =="
python tools/band_skew_probe.py --sf 0.3 --one-hot-docs 8000 \
    --out BAND_SKEW_SF03.json

echo "closing ritual complete — commit the SWEEP logs, PLANS.md,"
echo "COVERAGE.md, BENCH_DETAIL.json, BENCH_CLOSING_${TAG}.json,"
echo "ROTATE_${TAG}.json and BAND_SKEW_SF03.json with the final snapshot."
echo "BASELINE.md's round narrative quotes ONLY the pinned BENCH_CLOSING"
echo "number."
