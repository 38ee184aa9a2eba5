"""ST-KMV tests: the incrementally-maintained sketch must equal the
one-shot sketch under ANY batch split and under replay (the KMV merge is
associative/commutative/idempotent), estimates must track exact distinct
counts, and the stream wiring must converge to the same state."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdmx_airquality_etl_spark.sources.parquet import load_table
from cdmx_airquality_etl_spark.streaming.kmv_maintenance import (
    KMV_K,
    batch_hashes,
    kmv_stream,
    merge_sketch,
    read_kmv_estimate,
    read_sketch,
    update_sketch,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _oneshot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    empty = spark.createDataFrame([], "key string, hv long")
    return {
        (r["key"], r["hv"])
        for r in merge_sketch(
            empty, batch_hashes(ev, "event_type", "user_id")
        ).collect()
    }


def test_any_split_converges_to_oneshot(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    want = _oneshot(spark, sf_dir)
    state = str(tmp_path / "st")
    for i, part in enumerate([ev.filter(F.col("user_id") % 3 == k) for k in range(3)]):
        update_sketch(spark, part, state, i, "event_type", "user_id")
    got = {(r["key"], r["hv"]) for r in read_sketch(spark, state).collect()}
    assert got == want


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "st")
    update_sketch(spark, ev, state, 0, "event_type", "user_id")
    before = sorted(map(tuple, read_sketch(spark, state).collect()))
    update_sketch(spark, ev, state, 0, "event_type", "user_id")  # replay
    update_sketch(spark, ev, state, 1, "event_type", "user_id")  # re-merge
    after = sorted(map(tuple, read_sketch(spark, state).collect()))
    assert before == after


def test_estimate_tracks_exact(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "st")
    update_sketch(spark, ev, state, 0, "event_type", "user_id")
    est = {r["key"]: r for r in read_kmv_estimate(spark, state).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for key, n in exact.items():
        e = est[key]
        if e["n_hashes"] < KMV_K:
            assert e["kmv_estimate"] == n  # sketch still exact
        else:
            assert e["kmv_estimate"] == pytest.approx(n, rel=0.5)


def test_empty_state_reads_empty(spark, tmp_path):
    df = read_kmv_estimate(spark, str(tmp_path / "nope"))
    assert df.columns == ["key", "n_hashes", "kmv_estimate"]
    assert df.count() == 0


def test_stream_converges_to_oneshot(spark, sf_dir, tmp_path):
    ev = pq.read_table(f"{sf_dir}/events.parquet")
    src = tmp_path / "src"
    src.mkdir()
    third = max(1, ev.num_rows // 3)
    pq.write_table(ev.slice(0, third), f"{src}/part-0.parquet")
    pq.write_table(ev.slice(third, third), f"{src}/part-1.parquet")
    pq.write_table(ev.slice(2 * third), f"{src}/part-2.parquet")
    state = str(tmp_path / "st")
    q = kmv_stream(
        spark, str(src), EVENT_SCHEMA, state, str(tmp_path / "ckpt"),
        "event_type", "user_id",
    )
    q.awaitTermination(120)
    got = {(r["key"], r["hv"]) for r in read_sketch(spark, state).collect()}
    assert got == _oneshot(spark, sf_dir)


def test_kill_mid_batch_then_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Round-9 follow-through on VERDICT r8 #5: a real kill-mid-batch for
    the KMV sink. The crash is injected at the worst point — the versioned
    sketch write COMMITS, then the process dies before the streaming
    checkpoint records the batch — so on restart the source replays the
    batch. The KMV merge is idempotent, so even a re-merge would converge,
    but the _SUCCESS short-circuit must still skip the committed version
    (the cheap path) and the final sketch must equal the one-shot."""
    import os

    land = str(tmp_path / "land")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    for i in range(3):
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(land, f"snap{i}"))

    crashed = {"done": False}

    def _crashing(batch_df, batch_id):
        update_sketch(
            batch_df.sparkSession, batch_df, state, batch_id,
            "event_type", "user_id",
        )
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between sink write and ckpt")

    def _start(fn):
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(land, "snap*"))
        )
        return (
            stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = _start(_crashing)
    with pytest.raises(Exception):
        q.awaitTermination()
    assert crashed["done"]

    # restart on the same checkpoint: batch 1 replays (its sketch version
    # is committed -> short-circuit), batch 2 runs fresh
    q2 = _start(
        lambda df, bid: update_sketch(
            df.sparkSession, df, state, bid, "event_type", "user_id"
        )
    )
    q2.awaitTermination()

    got = {(r["key"], r["hv"]) for r in read_sketch(spark, state).collect()}
    assert got == _oneshot(spark, sf_dir)
