"""ST-INGEST — incremental snapshot ingestion (SURVEY.md §2B).

The reference's incrementality is scheduler-level: an OS task fires
launcher.bat hourly and each run merges one snapshot into the accumulating DB
(/root/reference/launcher.bat:1-3 + scrapper.py:329-331). The Spark-native
equivalent is a file-source stream with ``Trigger.AvailableNow`` driving the
same keyed merge through ``foreachBatch``:

    new snapshot files land in a directory
      → readStream picks up only unseen files (checkpointed source offsets)
      → foreachBatch(merge_into_parquet)  — the M-UPSERT path, per batch
      → exactly-once per file via checkpoint + idempotent keyed merge

At scale the checkpoint lives on shared storage and the merge is
partition-scoped (plans/merge.py), so an hourly micro-batch rewrites only the
partitions it touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..plans.merge import merge_into_parquet


def ingest_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    target_path: str,
    keys: list[str],
    counter_col: str | None = "nupdates",
    partition_col: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
    version_col: str | None = "_ingest_batch_id",
):
    """Run (or start) the incremental ingest stream.

    With ``available_now=True`` this processes every unseen file then stops —
    the scheduled-batch shape of the reference (one launcher run ≙ one call).
    Returns the finished/running StreamingQuery.

    ``version_col`` (default on) stamps each batch's rows with the
    micro-batch id and routes it to the merge's version guard, making the
    whole upsert — counter included — idempotent when foreachBatch
    replays a batch after a crash between the sink write and the
    checkpoint commit (plans/merge.merge_upsert docstring; pinned by
    tests/test_streaming_recovery.py). Pass None for the raw
    reference-parity behavior where every re-merge bumps the counter.
    """
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        src = batch_df
        if version_col is not None:
            src = src.withColumn(version_col, F.lit(int(batch_id)))
        merge_into_parquet(
            batch_df.sparkSession,
            src,
            target_path,
            keys,
            counter_col=counter_col,
            partition_col=partition_col,
            version_col=version_col,
        )

    writer = stream.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()
