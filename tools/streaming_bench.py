"""Streaming throughput + latency harness (VERDICT r7 #4): put measured
numbers behind the streaming half of the 100 TB story, the way bench.py
does for batch.

Six workloads, all file-source micro-batch streams under
Trigger.AvailableNow with ``maxFilesPerTrigger=1`` (so each landing file
is one micro-batch — the reference's one-launcher-run-per-snapshot
cadence, scrapper.py:329-331 + launcher.bat):

- **ST-INGEST**: N snapshot files of the orders table keyed by
  o_orderkey drive the foreachBatch keyed merge (streaming/ingest.py →
  plans/merge.py). This measures the full upsert path including the
  partition-bounded target rewrite per batch.
- **ST-COUNT**: N files of the events table drive the watermarked
  windowed count (streaming/stateful.py) with a foreachBatch overwrite
  sink.
- **ST-DEDUP**: documents through the watermarked fingerprint dedup
  (streaming/dedup.py) into an append sink; output must equal the
  distinct fingerprint count.
- **ST-CMS / ST-KMV / ST-BLOCK**: the _SUCCESS-protocol index
  maintenance sinks (count-min sketch, K-minimum-values sketch,
  sub-document block index); each final state must be row-identical to
  its one-shot batch computation.

Metrics come from the query's own progress stream (numInputRows +
durationMs.triggerExecution per micro-batch): rows/s overall plus
p50/max per-batch latency. Protocol matches BASELINE.md: idle host,
foreground run, one JSON line on stdout.

Usage: python tools/streaming_bench.py [--sf-dir /root/testdata/sf0.1]
           [--batches 8] [--out STREAMING_BENCH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402
from cdmx_airquality_etl_spark.streaming.ingest import ingest_stream  # noqa: E402
from cdmx_airquality_etl_spark.streaming.stateful import (  # noqa: E402
    run_windowed_counts_stream,
)


def _split_table(
    spark, sf_dir: str, table: str, out_dir: str, n: int, cols=None,
    transform=None,
):
    """Materialize the table as n single-FILE snapshots in a landing dir.

    Plain files, not parquet directories: a ``*.parquet`` glob over
    directory-shaped outputs makes the file source discover each part
    file twice (once per matching listing path), silently doubling
    numInputRows — measured before this layout was adopted."""
    df = load_table(spark, sf_dir, table)
    if cols:
        df = df.select(*cols)
    if transform is not None:
        df = transform(df)
    total = df.count()
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        tmp = os.path.join(out_dir, f"_tmp{i:03d}")
        (
            df.filter(f"pmod(hash(cast({df.columns[0]} as string)), {n}) = {i}")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        shutil.move(
            os.path.join(tmp, part), os.path.join(out_dir, f"snap{i:03d}.parquet")
        )
        shutil.rmtree(tmp)
    return df.schema, total


def _progress_stats(query, true_rows: int) -> dict:
    """numInputRows is NOT used for throughput: a foreachBatch body that
    evaluates the batch frame more than once (ingest's isEmpty guard +
    the merge join) inflates it proportionally (measured 2x on the merge
    path). The source table's own row count is the honest numerator."""
    batches = [
        p for p in query.recentProgress if p.get("numInputRows", 0) > 0
    ]
    lat = [p["durationMs"]["triggerExecution"] for p in batches]
    return {
        "batches": len(batches),
        "rows": true_rows,
        "reported_input_rows": sum(p["numInputRows"] for p in batches),
        "batch_ms_p50": statistics.median(lat) if lat else None,
        "batch_ms_max": max(lat) if lat else None,
        "sum_trigger_ms": sum(lat),
    }


def bench_st_count(spark, sf_dir: str, work: str, batches: int) -> dict:
    land = os.path.join(work, "count_land")
    schema, total = _split_table(
        spark, sf_dir, "events", land, batches, cols=["ts", "event_type"]
    )
    out = os.path.join(work, "count_out")
    ckpt = os.path.join(work, "count_ckpt")
    t0 = time.time()
    q = run_windowed_counts_stream(
        spark, os.path.join(land, "*.parquet"), schema, out, ckpt,
        max_files_per_trigger=1,
    )
    wall = time.time() - t0
    stats = _progress_stats(q, total)
    stats["wall_sec"] = round(wall, 3)
    stats["rows_per_sec"] = round(stats["rows"] / wall) if wall else None
    return stats


def bench_st_ingest(spark, sf_dir: str, work: str, batches: int) -> dict:
    land = os.path.join(work, "ingest_land")
    schema, total = _split_table(
        spark,
        sf_dir,
        "orders",
        land,
        batches,
        cols=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )
    tgt = os.path.join(work, "ingest_tgt")
    ckpt = os.path.join(work, "ingest_ckpt")
    t0 = time.time()
    q = ingest_stream(
        spark,
        os.path.join(land, "*.parquet"),
        schema,
        tgt,
        keys=["o_orderkey"],
        checkpoint_dir=ckpt,
        max_files_per_trigger=1,
    )
    wall = time.time() - t0
    stats = _progress_stats(q, total)
    stats["wall_sec"] = round(wall, 3)
    stats["rows_per_sec"] = round(stats["rows"] / wall) if wall else None
    # integrity: every input row landed exactly once (keys are unique)
    stats["target_rows"] = (
        spark.read.parquet(tgt).count()
    )
    return stats


def bench_st_dedup(spark, sf_dir: str, work: str, batches: int) -> dict:
    """ST-DEDUP (round-9 VERDICT #5): the documents table streamed through
    the watermarked fingerprint dedup (streaming/dedup.py →
    dropDuplicatesWithinWatermark) into an append file sink. Event time is
    synthesized from doc_id (1 ms apart) and the watermark delay covers
    the whole span, so the expected output is EXACTLY the distinct
    fingerprint count — integrity is asserted, not assumed."""
    from pyspark.sql import functions as F

    from cdmx_airquality_etl_spark.streaming.dedup import (
        content_fingerprint,
        dedup_stream_within_watermark,
    )

    land = os.path.join(work, "dedup_land")
    schema, total = _split_table(
        spark, sf_dir, "documents", land, batches,
        cols=["doc_id", "text"],
        # offset well past the epoch: an initial watermark clamps at
        # 1970-01-01, and a row whose event time EQUALS the watermark is
        # dropped as late (measured: doc_id=0 vanished)
        transform=lambda df: df.withColumn(
            "ts",
            F.timestamp_micros(F.lit(1_704_067_200_000_000) + F.col("doc_id") * 1000),
        ),
    )
    expected = (
        load_table(spark, sf_dir, "documents")
        .select(content_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    out = os.path.join(work, "dedup_out")
    ckpt = os.path.join(work, "dedup_ckpt")
    t0 = time.time()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(land, "*.parquet"))
    )
    q = (
        dedup_stream_within_watermark(stream, ts_col="ts", delay="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    stats = _progress_stats(q, total)
    stats["wall_sec"] = round(wall, 3)
    stats["rows_per_sec"] = round(stats["rows"] / wall) if wall else None
    got = spark.read.parquet(out).count()
    stats["output_rows"] = got
    stats["expected_distinct"] = expected
    if got != expected:
        raise AssertionError(
            f"ST-DEDUP integrity: {got} output rows != {expected} distinct "
            "fingerprints"
        )
    return stats


def bench_st_kmv(spark, sf_dir: str, work: str, batches: int) -> dict:
    """ST-KMV: the K-minimum-values distinct-count sketch maintenance
    stream (streaming/kmv_maintenance.py) over events — distinct users
    per event_type kept incrementally under the versioned _SUCCESS
    protocol. Integrity: the final sketch is row-identical to the
    one-shot merge of the whole table (the KMV merge is associative/
    commutative/idempotent, so ANY batch split must converge)."""
    from cdmx_airquality_etl_spark.streaming.kmv_maintenance import (
        batch_hashes,
        kmv_stream,
        merge_sketch,
        read_sketch,
    )

    land = os.path.join(work, "kmv_land")
    schema, total = _split_table(
        spark, sf_dir, "events", land, batches,
        cols=["event_id", "event_type", "user_id"],
    )
    state = os.path.join(work, "kmv_state")
    ckpt = os.path.join(work, "kmv_ckpt")
    t0 = time.time()
    q = kmv_stream(
        spark, os.path.join(land, "*.parquet"), schema, state, ckpt,
        key_col="event_type", value_col="user_id",
    )
    q.awaitTermination()
    wall = time.time() - t0
    stats = _progress_stats(q, total)
    stats["wall_sec"] = round(wall, 3)
    stats["rows_per_sec"] = round(stats["rows"] / wall) if wall else None
    oneshot = merge_sketch(
        read_sketch(spark, os.path.join(work, "__empty_kmv")),
        batch_hashes(
            load_table(spark, sf_dir, "events").select("event_type", "user_id"),
            "event_type",
            "user_id",
        ),
    ).withColumnRenamed("hv", "hv_one")
    streamed = read_sketch(spark, state)
    diff = (
        streamed.join(
            oneshot,
            (streamed.key == oneshot.key) & (streamed.hv == oneshot.hv_one),
            "full_outer",
        )
        .filter(F.col("hv").isNull() | F.col("hv_one").isNull())
        .count()
    )
    stats["sketch_matches_oneshot"] = diff == 0
    if diff:
        raise AssertionError("ST-KMV integrity: streamed sketch != one-shot")
    return stats


def bench_st_block(spark, sf_dir: str, work: str, batches: int) -> dict:
    """ST-BLOCK: the sub-document block-index maintenance stream
    (streaming/block_index.py) over documents — per-block (n_docs,
    n_occurrences) counts accumulated as append-only per-batch partials
    under the _SUCCESS protocol. Integrity: the collapsed index equals
    the one-shot batch aggregate over the full corpus (counting is NOT
    idempotent, so this is the sink whose replay guard carries the most
    weight)."""
    from cdmx_airquality_etl_spark.streaming.block_index import (
        _batch_blocks,
        block_index_stream,
        read_block_index,
    )

    land = os.path.join(work, "block_land")
    schema, total = _split_table(
        spark, sf_dir, "documents", land, batches, cols=["doc_id", "text"]
    )
    index = os.path.join(work, "block_index")
    ckpt = os.path.join(work, "block_ckpt")
    t0 = time.time()
    q = block_index_stream(
        spark, os.path.join(land, "*.parquet"), schema, index, ckpt
    )
    q.awaitTermination()
    wall = time.time() - t0
    stats = _progress_stats(q, total)
    stats["wall_sec"] = round(wall, 3)
    stats["rows_per_sec"] = round(stats["rows"] / wall) if wall else None
    oneshot = (
        _batch_blocks(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
        .groupBy("block_hash")
        .agg(
            F.countDistinct("doc_id").alias("nd_one"),
            F.count(F.lit(1)).alias("no_one"),
        )
    )
    merged = read_block_index(spark, index)
    diff = (
        merged.join(oneshot, "block_hash", "full_outer")
        .filter(
            ~F.col("n_docs").eqNullSafe(F.col("nd_one"))
            | ~F.col("n_occurrences").eqNullSafe(F.col("no_one"))
        )
        .count()
    )
    stats["index_matches_oneshot"] = diff == 0
    if diff:
        raise AssertionError("ST-BLOCK integrity: streamed index != one-shot")
    return stats


def bench_st_cms(spark, sf_dir: str, work: str, batches: int) -> dict:
    """ST-CMS (round-9 VERDICT #5): the count-min index-maintenance stream
    (streaming/cms_maintenance.py) over events keyed on event_type —
    versioned _SUCCESS-protocol sketch state, one version per micro-batch.
    Integrity: the final sketch equals the one-shot batch sketch."""
    from cdmx_airquality_etl_spark.streaming.cms_maintenance import (
        batch_increments,
        cms_stream,
        merge_sketch,
        read_sketch,
    )

    land = os.path.join(work, "cms_land")
    schema, total = _split_table(
        spark, sf_dir, "events", land, batches, cols=["event_id", "event_type"]
    )
    state = os.path.join(work, "cms_state")
    ckpt = os.path.join(work, "cms_ckpt")
    t0 = time.time()
    q = cms_stream(
        spark, os.path.join(land, "*.parquet"), schema, state, ckpt,
        key_col="event_type",
    )
    q.awaitTermination()
    wall = time.time() - t0
    stats = _progress_stats(q, total)
    stats["wall_sec"] = round(wall, 3)
    stats["rows_per_sec"] = round(stats["rows"] / wall) if wall else None
    oneshot = merge_sketch(
        read_sketch(spark, os.path.join(work, "__empty_cms")),
        batch_increments(
            load_table(spark, sf_dir, "events").select("event_id", "event_type"),
            "event_type",
        ),
    ).withColumnRenamed("cnt", "cnt_one")
    streamed = read_sketch(spark, state)
    diff = (
        streamed.join(oneshot, ["r", "bucket"], "full_outer")
        .filter(~F.col("cnt").eqNullSafe(F.col("cnt_one")))
        .count()
    )
    stats["sketch_matches_oneshot"] = diff == 0
    if diff:
        raise AssertionError("ST-CMS integrity: streamed sketch != one-shot")
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        REPO_ROOT, "STREAMING_BENCH.json"))
    ap.add_argument(
        "--workloads", nargs="+",
        default=["st_count", "st_ingest", "st_dedup", "st_cms", "st_kmv",
                 "st_block"],
    )
    args = ap.parse_args()

    spark = get_spark("streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")

    benches = {
        "st_count": bench_st_count,
        "st_ingest": bench_st_ingest,
        "st_dedup": bench_st_dedup,
        "st_cms": bench_st_cms,
        "st_kmv": bench_st_kmv,
        "st_block": bench_st_block,
    }
    work = tempfile.mkdtemp(prefix="streaming_bench_")
    try:
        result = {"sf_dir": args.sf_dir, "batches_requested": args.batches}
        for name in args.workloads:
            result[name] = benches[name](spark, args.sf_dir, work, args.batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(result, separators=(",", ":"))
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
