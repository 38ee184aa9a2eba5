"""Diagnose the t = 0.5 anchor-candidate volume at a given scale factor
(round 11: q_dedup_fuzzy's sf3→sf10 slope measured 1.92 — this probe
answers WHY, the way the r10 planner numbers did for t = 0.1).

Counts, on the REAL operator anchors (dedup._anchor_keys — not a
reconstruction):
  - anchor rows and distinct keys (key-space saturation: mean df),
  - candidate pairs under the shipped ≥1-key rule,
  - candidate pairs under the dual ≥2-key rule (with the __small
    OR-branch, i.e. exactly _salted_anchor_candidates(min_shared=2)),
  - true pairs (J ≥ t) for the noise ratio.

Usage: python tools/anchor_saturation_probe.py [sf_dir] [--threshold 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cdmx_airquality_etl_spark.operators import dedup  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/repo/.scaledata/sf3")
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_spark("anchor-saturation-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")
    shingled = dedup._doc_shingles(docs)
    out: dict = {"sf_dir": args.sf_dir, "threshold": args.threshold}

    anch = dedup._anchor_keys(shingled, args.threshold, min_shared=1).cache()
    t0 = time.time()
    out["anchor_rows"] = anch.count()
    stats = anch.groupBy("akey").count()
    row = stats.agg(
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("count").alias("hottest_df"),
        F.avg("count").alias("mean_df"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
            "join_rows_upper"
        ),
    ).collect()[0]
    out.update(
        distinct_keys=row["distinct_keys"],
        hottest_df=row["hottest_df"],
        mean_df=round(row["mean_df"], 2),
        join_rows_upper=int(row["join_rows_upper"]),
        anchor_stats_sec=round(time.time() - t0, 1),
    )

    for ms in (1, 2):
        a = dedup._anchor_keys(shingled, args.threshold, min_shared=ms)
        cand = dedup._salted_anchor_candidates(a, min_shared=ms)
        t0 = time.time()
        out[f"candidates_min_shared_{ms}"] = cand.count()
        out[f"candidates_min_shared_{ms}_sec"] = round(time.time() - t0, 1)

    pairs = dedup._anchor_jaccard_pairs(shingled, args.threshold)
    t0 = time.time()
    out["true_pairs"] = pairs.count()
    out["true_pairs_sec"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
