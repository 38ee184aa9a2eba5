"""Incremental ingest, end to end: the reference's hourly-scheduler
workflow (launcher.bat firing scrapper.py, each run merging one snapshot
into the accumulating DB — /root/reference/launcher.bat:1-3 +
scrapper.py:329-331) re-expressed as the engine's checkpointed streaming
pipeline, including the part the reference got for free from SQLite and a
cron lock: crash recovery.

What this script shows, in order:
1. snapshot files land in a directory; each `ingest_stream` call (one
   "scheduled run") merges only the unseen ones via the checkpointed file
   source + foreachBatch keyed merge (ST-INGEST / M-UPSERT / C-SCHED);
2. a re-scrape of the same key updates in place and bumps ``nupdates`` —
   exactly the reference's ON CONFLICT counter;
3. a scheduler re-fire with nothing new is a checkpointed no-op
   (exactly-once per file, the launcher.bat re-run contract);
4. the continuously-maintained join view (streaming/view_maintenance)
   over the same landing pattern, with a replayed batch id absorbed by
   its batch-dir _SUCCESS marker — the crash-recovery protocol
   (kill-mid-batch restart is exercised in
   tests/test_streaming_recovery.py; the ingest counter's version guard
   is pinned there too).

Run: python examples/incremental_ingest.py
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import Row
from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdmx_airquality_etl_spark.plans.ivm_join import build_view
from cdmx_airquality_etl_spark.session import get_spark
from cdmx_airquality_etl_spark.streaming.ingest import ingest_stream
from cdmx_airquality_etl_spark.streaming.view_maintenance import (
    apply_fact_delta_versioned,
    read_view,
    seed_view,
)

SCHEMA = StructType(
    [
        StructField("report_ts", LongType(), True),
        StructField("station", StringType(), True),
        StructField("quality", StringType(), True),
    ]
)


def _land(spark, src: str, rows: list[Row]) -> None:
    # append flat part files into the landing dir — the layout a scraper
    # dropping one file per run produces (and what the file source lists)
    (
        spark.createDataFrame(rows, SCHEMA)
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )


def main(argv: list[str] | None = None) -> int:
    spark = get_spark("example-incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_example_")
    src = os.path.join(work, "incoming")
    tgt = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    # -- 1. first scheduled run: one snapshot lands, stream merges it
    _land(spark, src, [Row(report_ts=2026081510, station="UIZ", quality="buena")])
    ingest_stream(spark, src, SCHEMA, tgt, keys=["report_ts", "station"],
                  checkpoint_dir=ckpt)
    print("after run 1:",
          sorted(spark.read.parquet(tgt).collect(), key=lambda r: r["station"]))

    # -- 2. second run: a re-scrape (same key, new value) + a new station
    _land(spark, src, [
        Row(report_ts=2026081510, station="UIZ", quality="regular"),
        Row(report_ts=2026081510, station="MER", quality="buena"),
    ])
    ingest_stream(spark, src, SCHEMA, tgt, keys=["report_ts", "station"],
                  checkpoint_dir=ckpt)
    out = {r["station"]: r for r in spark.read.parquet(tgt).collect()}
    assert out["UIZ"]["quality"] == "regular" and out["UIZ"]["nupdates"] == 2
    assert out["MER"]["nupdates"] == 1
    print("after run 2: UIZ updated in place (nupdates=2), MER inserted")

    # -- 3. a scheduler re-fire with nothing new is a checkpointed no-op
    ingest_stream(spark, src, SCHEMA, tgt, keys=["report_ts", "station"],
                  checkpoint_dir=ckpt)
    assert {r["station"]: r["nupdates"] for r in
            spark.read.parquet(tgt).collect()} == {"UIZ": 2, "MER": 1}
    print("after run 3: no new files -> exactly-once no-op")

    # -- 4. crash recovery on the join-view sink: the batch's write
    #       commits, the "process dies" before the checkpoint would, and
    #       the replayed batch id is absorbed by its _SUCCESS marker
    dim = spark.createDataFrame(
        [Row(station="UIZ", borough="Iztapalapa"),
         Row(station="MER", borough="Venustiano Carranza")],
        "station string, borough string",
    )
    view = os.path.join(work, "view")
    facts = spark.read.parquet(tgt).select("station", "quality")
    seed_view(build_view(facts.limit(0), dim, "station"), view)
    wrote = apply_fact_delta_versioned(spark, view, facts, dim, "station", 0)
    replay = apply_fact_delta_versioned(spark, view, facts, dim, "station", 0)
    assert wrote is True and replay is False  # the crash-replay no-op
    n = read_view(spark, view).count()
    assert n == facts.count()
    print(f"view maintained: {n} joined rows; replay of batch 0 skipped")

    print("incremental ingest example complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
