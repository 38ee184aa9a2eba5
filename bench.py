"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-sink write (full execution, no driver
collect/serialization cost in the measurement). One warm-up scan first so
JVM/codegen/parquet-footer warmup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdmx_airquality_etl_spark import QUERIES  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footers
    load_table(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        # drop caches a query may have built (dedup/decontamination cache
        # shared subtrees): each query is measured cold on an otherwise
        # empty executor heap, and cached blocks never pressure later
        # queries' GC
        spark.catalog.clearCache()

    ok = {k: v for k, v in timings.items() if v >= 0}
    result = {
        "metric": "total_wall_sec_all_queries",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
    }
    print(json.dumps(result))
    return 0 if len(ok) == len(timings) else 1


if __name__ == "__main__":
    sys.exit(main())
