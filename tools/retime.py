"""Standalone re-timer for one or more registered queries.

BASELINE.md's outlier rule says a query timing far off its last committed
value "is not believable without a standalone re-time" — a fresh session,
the query's tables pre-warmed, N executions with ``clearCache`` between,
and the MIN taken (the quantity that scales with data, not with first-run
codegen JIT or a co-resident query's GC pressure).  Round 9's q_bigram_lm
1.05 s -> 1.63 s cross-round flag was exactly this failure mode: the
standalone re-time measured [4.97 (fresh-JVM JIT), 1.35, 1.15, 1.02, 1.02]
— warm steady-state 1.02 s, identical to the r8 closing 1.05 s.

``tools/bench_gate.py`` shells out to this script to adjudicate violations
automatically (see the gate's ``retime_verdict``); it is also usable by
hand:

  python tools/retime.py q_bigram_lm [q_other ...] [--runs 5]
      [--sf-dir /root/testdata/sf0.1] [--json]

``--json`` prints ONE machine-readable line:
  {"q_bigram_lm": {"runs": [...], "min": ..., "warm_min": ...}, ...}
where ``warm_min`` is the min EXCLUDING the first run (the like-for-like
number against a committed warm timing; ``min`` includes it and is the
like-for-like number against a committed cold timing only when the bench
process also paid that query's JIT — which it never does for queries deep
in registry order, so the gate compares ``warm_min``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from cdmx_airquality_etl_spark import QUERIES  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def retime(queries: list[str], sf_dir: str, runs: int) -> dict:
    spark = get_spark("retime")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    out: dict[str, dict] = {}
    for name in queries:
        if name not in QUERIES:
            out[name] = {"error": "unknown query"}
            continue
        times = []
        for _ in range(runs):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "runs": times,
            "min": min(times),
            "warm_min": min(times[1:]) if len(times) > 1 else times[0],
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    res = retime(args.queries, args.sf_dir, args.runs)
    if args.json:
        print(json.dumps(res))
    else:
        for name, r in res.items():
            print(f"{name}: {r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
