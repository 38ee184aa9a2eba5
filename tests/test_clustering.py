"""Connected-components correctness on known graphs: chains require multiple
propagation rounds, cycles must terminate, separate components must not leak
labels into each other."""

from pyspark.sql import Row

from cdmx_airquality_etl_spark.operators.clustering import connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges], "src long, dst long"
    )
    out = connected_components(df, "src", "dst")
    return {r["node"]: r["label"] for r in out.collect()}


def test_two_components_and_chain(spark):
    got = _labels(spark, [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 13: 10}


def test_cycle_terminates(spark):
    got = _labels(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_needs_many_rounds(spark):
    n = 12
    got = _labels(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}
