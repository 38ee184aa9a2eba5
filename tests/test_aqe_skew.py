"""Regression pin for the AQE skew-join threshold (round-7 finding).

The measured result this protects (tools/skew_probe.py, BASELINE.md "skew
robustness"): AQE's skew split fires only when the hot partition exceeds
BOTH skewedPartitionFactor x median AND skewedPartitionThresholdInBytes.
At this harness's partition sizes a pathological key sits UNDER the 256 MB
default and AQE silently does nothing (80%-hot probe: 16.5 s default vs
3.1 s with the split firing). session.py therefore ships a 64 MB
threshold — a 5.5x win that nothing would defend if reverted. This test
makes reverting it a failure:

1. pins the factory conf value itself,
2. builds a hot-key join whose hot partition lands BETWEEN 64 MB and
   256 MB of shuffle bytes and asserts the executed plan reports a skew
   split (``skew=true`` on the SortMergeJoin),
3. counter-probe: the same join under the 256 MB default must NOT split —
   proving the assertion in (2) is the conf's doing, not generic AQE.

The payload is concatenated per-row sha2 hex (no intra- or cross-row
repeats), so lz4 shuffle compression cannot shrink the hot partition
back under the threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOT_ROWS = 350_000  # x ~270 B/row ≈ 90 MB in the hot partition
TAIL_KEYS = 400
TAIL_ROWS_PER_KEY = 50

_THRESHOLD_KEY = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"


def _payload(col):
    # 256 hex chars with no repeated 64-char block: four differently-salted
    # digests, so lz4 finds nothing to match within or across rows.
    return F.concat(
        *[F.sha2(F.concat(col.cast("string"), F.lit(s)), 256) for s in "abcd"]
    )


def _run_skewed_join(spark):
    left = (
        spark.range(HOT_ROWS + TAIL_KEYS * TAIL_ROWS_PER_KEY)
        .withColumn(
            "k",
            F.when(F.col("id") < HOT_ROWS, F.lit(0)).otherwise(
                (F.col("id") % TAIL_KEYS) + 1
            ),
        )
        .withColumn("payload", _payload(F.col("id")))
    )
    right = (
        spark.range(TAIL_KEYS + 1)
        .withColumnRenamed("id", "k")
        .withColumn("dim", F.sha2(F.col("k").cast("string"), 256))
    )
    # merge hint: the probe is about reducer skew — a broadcast of the dim
    # side would dodge the phenomenon entirely (same as tools/skew_probe.py)
    res = (
        left.hint("merge")
        .join(right, "k")
        .agg(F.sum(F.octet_length("payload")).alias("b"))
    )
    res.collect()
    return res._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffle-join topology under test (AQE may otherwise demote
    the SMJ to broadcast at runtime and skew handling never enters)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_session_factory_pins_64mb_threshold(spark):
    # The load-bearing conf itself: reverting session.py fails here first.
    assert spark.conf.get(_THRESHOLD_KEY) == "64MB"


def test_skew_split_fires_under_factory_conf(spark, no_broadcast):
    plan = _run_skewed_join(spark)
    assert "skew=true" in plan, (
        "AQE did not split the hot partition under the session factory's "
        f"64MB threshold — executed plan:\n{plan}"
    )


def test_skew_split_silent_under_256mb_default(spark, no_broadcast):
    # The counter-probe that makes the 64MB setting demonstrably
    # load-bearing: under the stock default the same join must NOT split.
    saved = spark.conf.get(_THRESHOLD_KEY)
    spark.conf.set(_THRESHOLD_KEY, "256MB")
    try:
        plan = _run_skewed_join(spark)
    finally:
        spark.conf.set(_THRESHOLD_KEY, saved)
    assert "skew=true" not in plan, (
        "the probe corpus unexpectedly exceeds the 256MB default — enlarge "
        "thresholds or shrink HOT_ROWS so the A/B stays meaningful"
    )
