"""Streaming throughput + latency harness (VERDICT r7 #4): put measured
numbers behind the streaming half of the 100 TB story, the way bench.py
does for batch.

Two workloads, both file-source micro-batch streams under
Trigger.AvailableNow with ``maxFilesPerTrigger=1`` (so each landing file
is one micro-batch — the reference's one-launcher-run-per-snapshot
cadence, scrapper.py:329-331 + launcher.bat):

- **ST-INGEST**: N snapshot files of the sf0.1 orders table keyed by
  o_orderkey drive the foreachBatch keyed merge (streaming/ingest.py →
  plans/merge.py). This measures the full upsert path including the
  partition-bounded target rewrite per batch.
- **ST-COUNT**: N files of the sf0.1 events table drive the watermarked
  windowed count (streaming/stateful.py) with a foreachBatch overwrite
  sink.

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

from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402
from cdmx_airquality_etl_spark.streaming.ingest import ingest_stream  # noqa: E402
from cdmx_airquality_etl_spark.streaming.stateful import (  # noqa: E402
    run_windowed_counts_stream,
)


def _split_table(spark, sf_dir: str, table: str, out_dir: str, n: int, cols=None):
    """Materialize the table as n single-FILE snapshots in a landing dir.

    Plain files, not parquet directories: a ``*.parquet`` glob over
    directory-shaped outputs makes the file source discover each part
    file twice (once per matching listing path), silently doubling
    numInputRows — measured before this layout was adopted."""
    df = load_table(spark, sf_dir, table)
    if cols:
        df = df.select(*cols)
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        REPO_ROOT, "STREAMING_BENCH.json"))
    args = ap.parse_args()

    spark = get_spark("streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="streaming_bench_")
    try:
        result = {
            "sf_dir": args.sf_dir,
            "batches_requested": args.batches,
            "st_count": bench_st_count(spark, args.sf_dir, work, args.batches),
            "st_ingest": bench_st_ingest(spark, args.sf_dir, work, args.batches),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(result, separators=(",", ":"))
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
