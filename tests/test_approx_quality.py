"""Approximate-aggregate quality gates: the approx operators trade exactness
for scale, and that trade must stay bounded — pinned against the exact
answers on the test corpus (both sides deterministic, so these are stable)."""

from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.sources.parquet import load_table


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact, approx = li.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"),
        F.percentile_approx("l_extendedprice", 0.5, 10000),
    ).first()
    assert abs(approx - exact) / exact < 0.005


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact, approx = orders.agg(
        F.countDistinct("o_custkey"),
        F.approx_count_distinct("o_custkey", rsd=0.02),
    ).first()
    assert abs(approx - exact) / exact < 0.05
