"""transformWithState running totals: same contract as the
applyInPandasWithState test — state survives microbatches and restarts, and
the final per-key state equals the batch aggregate — on the new API with the
RocksDB state store."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdmx_airquality_etl_spark.streaming.stateful_tws import (
    ROCKSDB_PROVIDER,
    running_totals_tws,
    tws_available,
)

pytestmark = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState needs the protobuf package for its "
    "Python<->JVM state protocol; not installed in this container and "
    "installs are prohibited. The operator's SEMANTICS are still pinned: "
    "tests/test_tws_equivalence.py drives RunningTotalsProcessor through "
    "a ValueState stub across microbatches + restart and proves it equal "
    "to both the batch ground truth and the applyInPandasWithState "
    "fallback — only the RocksDB state-server machinery is skipped here.",
)

SCHEMA = "event_type string, value double"


def _write_batch(spark, d, rows):
    spark.createDataFrame([Row(event_type=t, value=v) for t, v in rows], SCHEMA)\
        .coalesce(1).write.mode("append").parquet(d)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    totals = running_totals_tws(stream)

    def _write(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        totals.writeStream.foreachBatch(_write)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tws_state_survives_restart_and_matches_batch(spark, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
        batch1 = [("a", 1.0), ("a", 1.0), ("b", 2.0)]
        batch2 = [("a", 3.0), ("b", 1.0), ("b", 1.0), ("c", 5.0)]

        _write_batch(spark, src, batch1)
        _drain(spark, src, out, ckpt)
        _write_batch(spark, src, batch2)
        _drain(spark, src, out, ckpt)

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
        want = {}
        for t, v in batch1 + batch2:
            n, tot = want.get(t, (0, 0.0))
            want[t] = (n + 1, tot + v)
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
