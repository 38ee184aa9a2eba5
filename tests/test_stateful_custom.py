"""applyInPandasWithState running totals: state must survive microbatch
boundaries (within one drain) AND query restarts (checkpoint), and the final
per-key state must equal the batch groupBy over everything ingested."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdmx_airquality_etl_spark.streaming.stateful_custom import (
    run_running_totals_stream,
)

SCHEMA = "event_type string, value double"


def _write_batch(spark, d, rows):
    spark.createDataFrame([Row(event_type=t, value=v) for t, v in rows], SCHEMA)\
        .coalesce(1).write.mode("append").parquet(d)


def test_state_survives_restart_and_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [("a", 1.0), ("a", 1.0), ("b", 2.0)]
    batch2 = [("a", 3.0), ("b", 1.0), ("b", 1.0), ("c", 5.0)]

    _write_batch(spark, src, batch1)
    run_running_totals_stream(spark, src, SCHEMA, out, ckpt)
    _write_batch(spark, src, batch2)
    run_running_totals_stream(spark, src, SCHEMA, out, ckpt)

    latest = (
        spark.read.parquet(out)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.col("batch_id").desc())
            ),
        )
        .filter("rn = 1")
    )
    got = {r["key"]: (r["n_events"], r["total_value"]) for r in latest.collect()}
    # ground truth: batch aggregate over everything ingested
    want = {}
    for t, v in batch1 + batch2:
        n, tot = want.get(t, (0, 0.0))
        want[t] = (n + 1, tot + v)
    assert got == want
