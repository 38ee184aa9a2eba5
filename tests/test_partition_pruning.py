"""Partition-pruning proof: the history-table layout SURVEY.md §7 prescribes
(partition by a date-derived column, e.g. year_num/order month) must actually
prune — a predicate on the partition column has to reach the scan as a
PartitionFilter and cut the files read, or the layout buys nothing at 100 TB."""

from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.sources.parquet import load_table


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_column_filter_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "hist")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.month("o_orderdate")
    )
    orders.write.partitionBy("order_month").parquet(path)

    hist = spark.read.parquet(path)
    one_month = hist.filter(F.col("order_month") == 3)

    plan = _plan(one_month)
    assert "PartitionFilters" in plan
    assert "order_month" in plan.split("PartitionFilters", 1)[1].splitlines()[0]

    # the pruned read returns exactly the partition directory's contents
    direct = spark.read.parquet(f"{path}/order_month=3")
    assert one_month.count() == direct.count() > 0

    # non-partition predicates still push down as data filters
    plan2 = _plan(hist.filter(F.col("o_totalprice") > 100.0))
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan2
