"""Kill/restart exactness at sf3 for the two heaviest maintenance sinks
(round-10 VERDICT #8): ST-DEDUP and ST-BLOCK, the unit-test recovery
scenarios re-run at 150k-document volume.

Protocol per sink: split the sf3 documents table into N landing files,
start the AvailableNow stream with maxFilesPerTrigger=1, STOP it after the
first committed micro-batch (interruption is skipped-and-reported if the
stream outruns the stopper), restart on the same checkpoint, and assert
the final state equals the single-run answer exactly:

- ST-DEDUP: parquet-sink rows == distinct fingerprint count (the sink's
  transaction log + checkpointed dedup state must neither replay nor gap);
- ST-BLOCK: the collapsed _SUCCESS-protocol index row-identical to the
  one-shot batch aggregate (counting is not idempotent — a replayed
  partial would double-count, a lost one would under-count).

One JSON line on stdout; merged into STREAMING_BENCH.json's "sf3_recovery"
by the round's closing narrative.

Usage: python tools/streaming_recovery_sf3.py [--sf-dir .scaledata/sf3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
from cdmx_airquality_etl_spark.sources.parquet import load_table  # noqa: E402
from streaming_bench import _split_table  # noqa: E402


def _stop_after_first_batch(q) -> int:
    """Stop the query once >=1 micro-batch committed; return batches seen."""
    deadline = time.time() + 600
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.2)
    seen = len(q.recentProgress)
    q.stop()
    q.awaitTermination(600)
    return seen


def recover_st_dedup(spark, sf_dir: str, work: str, batches: int) -> dict:
    from cdmx_airquality_etl_spark.streaming.dedup import (
        content_fingerprint,
        dedup_stream_within_watermark,
    )

    land = os.path.join(work, "dedup_land")
    schema, total = _split_table(
        spark, sf_dir, "documents", land, batches,
        cols=["doc_id", "text"],
        transform=lambda df: df.withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000) + F.col("doc_id") * 1000
            ),
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

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(land, "*.parquet"))
        )
        return (
            dedup_stream_within_watermark(stream, ts_col="ts", delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    batches_before_stop = _stop_after_first_batch(start())
    interrupted = batches_before_stop < batches
    q2 = start()
    q2.awaitTermination()
    got = spark.read.parquet(out).count()
    ok = got == expected
    return {
        "rows": total,
        "batches": batches,
        "batches_before_stop": batches_before_stop,
        "interrupted": interrupted,
        "output_rows": got,
        "expected_distinct": expected,
        "exactly_once": ok,
    }


def recover_st_block(spark, sf_dir: str, work: str, batches: int) -> dict:
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

    def start():
        return block_index_stream(
            spark, os.path.join(land, "*.parquet"), schema, index, ckpt
        )

    batches_before_stop = _stop_after_first_batch(start())
    interrupted = batches_before_stop < batches
    q2 = start()
    q2.awaitTermination()

    oneshot = (
        _batch_blocks(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
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
    return {
        "rows": total,
        "batches": batches,
        "batches_before_stop": batches_before_stop,
        "interrupted": interrupted,
        "index_diff_rows": diff,
        "exactly_once": diff == 0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.path.join(REPO_ROOT, ".scaledata", "sf3")
    )
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("streaming-recovery-sf3")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="streaming_recovery_sf3_")
    try:
        result = {
            "sf_dir": args.sf_dir,
            "st_dedup": recover_st_dedup(spark, args.sf_dir, work, args.batches),
            "st_block": recover_st_block(spark, args.sf_dir, work, args.batches),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result, separators=(",", ":")))
    failures = [
        k for k in ("st_dedup", "st_block") if not result[k]["exactly_once"]
    ]
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
