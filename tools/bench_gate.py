"""Bench-artifact gate (VERDICT r6 #5): one number, checked, then pinned.

Round 6 committed BENCH_r06.json at 294.3 s while BASELINE.md narrated a
253.0 s run of the same surface minutes apart — both real under the
documented JVM swing, but a round must have ONE official bench artifact.
This gate runs right after ``bench.py`` inside the closing ritual and:

1. copies the fresh ``BENCH_DETAIL.json`` to ``BENCH_CLOSING_<tag>.json`` —
   the round's canonical idle-host number, the ONLY number BASELINE.md's
   narrative may quote;
2. automates the BASELINE.md outlier rule (a single query >3× its last
   committed time is not believable without a standalone re-time): compares
   per-query timings against the last committed ``BENCH_DETAIL.json``
   (``git show HEAD:BENCH_DETAIL.json``) and EXITS NONZERO on any query
   that got >3× slower while costing ≥1 s (sub-second queries swing freely
   with JVM noise and are exempt). Warm timings are compared when both
   sides have them (less JIT noise), cold otherwise.

Usage: python tools/bench_gate.py <round-tag>   (after bench.py)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OUTLIER_FACTOR = 3.0
MIN_ABS_SEC = 1.0


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rXX"
    detail_path = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        fresh = json.load(f)

    closing_path = os.path.join(REPO_ROOT, f"BENCH_CLOSING_{tag}.json")
    shutil.copyfile(detail_path, closing_path)
    print(
        f"pinned {closing_path}: total {fresh['value']}s over "
        f"{fresh['n_queries']} queries (sf{fresh['sf']}) — BASELINE.md must "
        "quote THIS number"
    )

    try:
        committed = json.loads(
            subprocess.check_output(
                ["git", "show", "HEAD:BENCH_DETAIL.json"],
                cwd=REPO_ROOT,
                text=True,
            )
        )
    except subprocess.CalledProcessError:
        print("no committed BENCH_DETAIL.json to compare against — skipping "
              "outlier gate")
        return 0

    def pick(d: dict, name: str, tier: str) -> float | None:
        v = d.get(tier, {}).get(name, -1.0)
        return v if v and v > 0 else None

    outliers = []
    for name in fresh.get("queries", {}):
        # like-for-like ONLY: warm-vs-warm when BOTH runs warmed this query
        # (the r07 false alarm: a HEADLINE-only warm pass compared fresh
        # COLD against the previous run's full-warm numbers and flagged
        # pure first-run JIT), else cold-vs-cold.
        new = pick(fresh, name, "warm_queries")
        old = pick(committed, name, "warm_queries")
        if new is None or old is None:
            new = pick(fresh, name, "queries")
            old = pick(committed, name, "queries")
        if new is None or old is None:
            continue
        if new >= MIN_ABS_SEC and new > OUTLIER_FACTOR * old:
            outliers.append((name, old, new))

    if outliers:
        print(f"BENCH GATE FAILED — {len(outliers)} queries >"
              f"{OUTLIER_FACTOR}× their last committed time:")
        for name, old, new in sorted(outliers, key=lambda x: -x[2]):
            print(f"  {name}: {old:.2f}s -> {new:.2f}s")
        print("per BASELINE.md's rule: standalone re-time each one (4 runs, "
              "clearCache between) before believing or committing this sweep")
        return 1
    print("bench gate: no >3× outliers vs last committed BENCH_DETAIL.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
