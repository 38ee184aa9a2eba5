#!/usr/bin/env bash
# Closing ritual — run before a round's final commit. Encodes the checks
# VERDICT r4/r5 asked to be un-forgettable:
#   1. full pytest (plan-shape gate included) must be green
#   2. raw oracle-sweep logs at sf0.001 / sf0.01 / sf0.1 (committed artifacts)
#   3. PLANS.md + COVERAGE.md regenerated (inventory-sync test pins them)
#   4. bench at sf0.1 -> BENCH_DETAIL.json refreshed
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

echo "== 3/4 inventories =="
python tools/dump_plans.py
python tools/dump_coverage.py
python -m pytest tests/test_inventory_sync.py -q

echo "== 4/4 bench =="
python bench.py

echo "closing ritual complete — commit the SWEEP logs, PLANS.md,"
echo "COVERAGE.md and BENCH_DETAIL.json with the final snapshot."
