"""Skew-robustness probe: measure what actually happens to the hot-key
join on a celebrity-key corpus, under each of the three strategies the
engine documents (README "Skew is a first-class concern"):

  plain      — hash join, AQE OFF: the hot key funnels through one reducer
               (the failure mode)
  aqe        — hash join, AQE skew-join ON (the engine's default session
               config): runtime split of oversized partitions
  salted     — the explicit q_join_skew_salted form: fact rows salt by
               hash%S, the dim side explodes ×S, join key becomes
               (key, salt)

Run on a `--skew` twin from tools/gen_scale_data.py. Each strategy is
timed as min of `--runs` warm noop-sink executions (same protocol as
tools/scaling_sweep.py). Prints one JSON line; feed the numbers to
BASELINE.md's skew-evidence section.

Usage: python tools/skew_probe.py [sf_dir] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cdmx_airquality_etl_spark.operators.scale_ops import _SALT_BUCKETS  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402


def _plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


def _salted(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li_s = li.withColumn(
        "salt",
        F.pmod(
            F.xxhash64("l_linenumber", "l_extendedprice"), F.lit(_SALT_BUCKETS)
        ).cast("int"),
    )
    ord_s = orders.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1)))
    )
    return (
        li_s.join(
            ord_s,
            (li_s.l_orderkey == ord_s.o_orderkey) & (li_s.salt == ord_s.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


def _time(spark, df_fn, sf_dir, runs):
    # force a shuffle join: the probe is about reducer skew, and a
    # broadcast of the dim side would dodge the phenomenon entirely
    best = math.inf
    for i in range(runs + 1):  # first run is the un-timed warm-up
        t0 = time.time()
        df_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i > 0:  # warm-up excluded from the min, per the protocol
            best = min(best, dt)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/repo/.scaledata/sf0.3-skew")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # dodge broadcast: the orders side is small at these SFs and a BHJ
    # would hide reducer skew that a real >10 GB dim could not
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    hot = (
        load_table(spark, args.sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .agg(F.max("count").alias("mx"), F.count(F.lit(1)).alias("keys"))
        .first()
    )
    out = {"sf_dir": args.sf_dir, "hottest_key_rows": hot["mx"], "n_keys": hot["keys"]}

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["plain_noaqe_sec"] = _time(spark, _plain, args.sf_dir, args.runs)
    out["salted_noaqe_sec"] = _time(spark, _salted, args.sf_dir, args.runs)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    out["plain_aqe_sec"] = _time(spark, _plain, args.sf_dir, args.runs)
    # AQE's skew-join split only fires when the hot partition exceeds BOTH
    # skewedPartitionFactor × median AND skewedPartitionThresholdInBytes
    # (default 256 MB) — at local test scale a pathological partition can
    # sit under the byte threshold and AQE silently does nothing. The
    # tuned row is what a cluster job that KNOWS its skew should set.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32MB")
    out["plain_aqe_tuned_sec"] = _time(spark, _plain, args.sf_dir, args.runs)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")

    # result equivalence across strategies (row-count + checksum)
    a = _plain(spark, args.sf_dir).orderBy("o_orderpriority").collect()
    b = _salted(spark, args.sf_dir).orderBy("o_orderpriority").collect()
    out["results_equal"] = [tuple(r) for r in a] == [tuple(r) for r in b]

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
