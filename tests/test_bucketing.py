"""Bucketed-table co-location: writing both join sides bucketed+sorted on the
join key lets the join run with NO shuffle exchange on either side — the
pre-partitioning strategy SURVEY §"Partitioning & shuffle" calls for at
100 TB (pay the shuffle once at write time, reuse it every join)."""

import pytest
from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{wh}'")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        load_table(spark, sf_dir, name).write.bucketBy(8, key).sortBy(
            key
        ).mode("overwrite").format("parquet").saveAsTable(f"buck.{name}_b")
    yield
    spark.sql("DROP TABLE IF EXISTS buck.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS buck.orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li = spark.table("buck.lineitem_b")
    orders = spark.table("buck.orders_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        join_section = plan.split("HashAggregate")[0]
        # co-located: the join itself needs no shuffle on either input
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is right
        n = joined.agg(F.sum("n")).collect()[0][0]
        li_n = li.count()
        assert n == li_n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
