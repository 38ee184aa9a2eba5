"""ST-JOIN / ST-DEDUP batch-equivalence: draining the streaming operator over
a closed directory must produce exactly the batch operator's rows."""

from datetime import datetime

from pyspark.sql import Row

from cdmx_airquality_etl_spark.streaming.joins import (
    dedup_within_watermark,
    interval_join,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ts(minute):
    return datetime(2024, 1, 1, 10, minute)


EVENTS = [
    Row(event_id=1, ts=_ts(0), user_id=1, event_type="imp"),
    Row(event_id=2, ts=_ts(10), user_id=1, event_type="click"),  # joins e1
    Row(event_id=3, ts=_ts(59), user_id=1, event_type="click"),  # joins e1 (< 1h)
    Row(event_id=4, ts=_ts(0), user_id=2, event_type="imp"),
    Row(event_id=5, ts=_ts(5), user_id=3, event_type="click"),  # no imp for u3
    Row(event_id=6, ts=_ts(10), user_id=1, event_type="click"),  # dup ts of e2
]


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_interval_join_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch_df = spark.createDataFrame(EVENTS, SCHEMA)
    batch_df.coalesce(1).write.parquet(src)

    imps_b = batch_df.filter("event_type = 'imp'")
    clicks_b = batch_df.filter("event_type = 'click'")
    expected = _sorted(interval_join(imps_b, clicks_b))
    assert len(expected) == 3  # e1×e2, e1×e3, e1×e6

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    joined = interval_join(
        stream.filter("event_type = 'imp'"),
        stream.filter("event_type = 'click'"),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _sorted(spark.read.parquet(out)) == expected


def test_dedup_within_watermark_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(EVENTS, SCHEMA).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    deduped = dedup_within_watermark(stream, ["user_id", "event_type"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # one row per (user, type): (1,imp),(1,click),(2,imp),(3,click)
    assert got.count() == 4
    assert got.select("user_id", "event_type").distinct().count() == 4
