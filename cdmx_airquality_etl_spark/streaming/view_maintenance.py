"""Streaming JOIN-view maintenance — the ivm_join fact path as a stream.

Fact files land in a directory; each micro-batch appends ``ΔA ⋈ B`` to
the materialized view (plans/ivm_join.apply_fact_delta). Composes the
corpus-ingest streaming skeleton (checkpointed file source, AvailableNow
per scheduled run, foreachBatch) with the delta-join algebra, giving the
continuously-maintained star-join view a warehouse actually serves
queries from.

Exactly-once: the source checkpoint processes each fact file once; the
append itself is the only side effect per batch, so replay protection is
the checkpoint (facts are append-only — re-delivery of a processed file
does not happen under the file-source contract; a crashed half-written
append leaves orphan part files that plans/maintenance.recover_table
cleans, the same story as the batch writer).

Scale notes: per batch the work is O(|ΔA|) — the dimension broadcasts,
the view append touches only new files, and nothing rescans the
accumulated view or fact history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..plans.ivm_join import apply_fact_delta


def view_maintenance_stream(
    spark: SparkSession,
    fact_dir: str,
    fact_schema: StructType,
    dim: DataFrame,
    key: str,
    view_path: str,
    checkpoint_dir: str,
):
    """Wire the incremental join view as a checkpointed AvailableNow
    stream over landing fact files."""
    stream = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(fact_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_fact_delta(batch_df.sparkSession, view_path, batch_df, dim, key)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
