"""Round-13 scan fan-out (operators/fanout.py): env semantics, the
under-split gate, result identity, and the probe's bounded decision.

The plan-shape consequences (round-robin exchange ahead of the dedup
emissions) are pinned in test_plans.py alongside the r12 signature
fan-out pin this generalizes."""

from __future__ import annotations

from cdmx_airquality_etl_spark.operators import fanout as FO
from cdmx_airquality_etl_spark.sources.parquet import load_table


def test_env_off_is_identity(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "0")
    docs = load_table(spark, sf_dir, "documents")
    assert FO.fan_out_scan(docs) is docs


def test_env_force_engages_and_under_split_gates(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "1")
    docs = load_table(spark, sf_dir, "documents")
    dp = spark.sparkContext.defaultParallelism
    fanned = FO.fan_out_scan(docs)
    assert fanned is not docs
    assert fanned.rdd.getNumPartitions() == dp
    # an input already at/above cluster width is left alone — the 100 TB
    # no-op property (real scans split past defaultParallelism)
    wide = docs.repartition(dp)
    assert FO.fan_out_scan(wide) is wide


def test_results_identical_with_and_without_fanout(spark, sf_dir, monkeypatch):
    # the correctness contract: a fan-out only moves rows; every consumer
    # aggregates exact integers / row-local scores, so results match
    # bit-for-bit whichever shape runs
    from cdmx_airquality_etl_spark import QUERIES

    rows = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", mode)
        rows[mode] = sorted(
            map(tuple, QUERIES["q_dedup_fuzzy"](spark, sf_dir).collect())
        )
    assert rows["0"] == rows["1"]
    assert rows["0"]  # non-vacuous: sf0.001 has fuzzy pairs


def test_probe_decision_is_bounded_and_cached(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    FO._PROBE_CACHE.clear()
    try:
        n = FO.scan_fanout_parallelism(spark)
        dp = spark.sparkContext.defaultParallelism
        assert n in (0, dp)  # engage fully or not at all — never a tuned N
        assert len(FO._PROBE_CACHE) == 1
        assert FO.scan_fanout_parallelism(spark) == n  # cached, no re-probe
    finally:
        FO._PROBE_CACHE.clear()
