"""Streaming sub-document block index — incremental boilerplate detection.

Composes the sub-document grain of operators/subdoc.py with the
corpus-ingest streaming pattern (streaming/corpus_ingest.py): as document
batches land, each batch's disjoint 10-token blocks merge into a
persistent block-frequency index, and the batch's documents are scored for
duplication against the index as it stood INCLUDING the batch itself —
the incremental form of q_doc_dup_ratio.

    document files land in a directory
      → readStream (checkpointed file source, AvailableNow per run)
      → foreachBatch:
           1. explode the batch into disjoint token blocks (subdoc._blocks
              contract: lowercase, whitespace tokens, stride = width = 10)
           2. aggregate per-batch (block_hash, n_docs, n_occurrences)
           3. merge into the index table by summing counts — correct
              because a document lives in exactly ONE batch, so distinct
              doc counts are additive across batches
           4. re-score the batch's docs against the merged index

Exactly-once: the source checkpoint processes each file once; unlike the
fingerprint anti-join, count merging is NOT idempotent under replay, so
the index merge keys on a batch watermark column (__batch_id) and replays
of an already-merged batch are dropped by an anti-join on that id — the
idempotence belt the counting pattern needs.

Scale notes: the index holds one row per distinct block (bounded by corpus
block vocabulary); the merge is a sum-by-key over the BATCH's blocks only;
scoring broadcasts the shared-block subset (size = corpus boilerplate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedup import _md5_int

_BLOCK_W = 10


def _batch_blocks(batch_df: DataFrame) -> DataFrame:
    """(doc_id, block_hash) pairs for one batch — subdoc._blocks contract."""
    tok = batch_df.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    ).filter(F.size("w") >= _BLOCK_W)
    return tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) div {_BLOCK_W} - 1),"
                f" b -> array_join(slice(w, b * {_BLOCK_W} + 1, {_BLOCK_W}), ' '))"
            )
        ).alias("blk"),
    ).select("doc_id", _md5_int(F.col("blk"), 15).alias("block_hash"))


def update_block_index(
    spark: SparkSession, batch_df: DataFrame, index_path: str, batch_id: int
) -> None:
    """Merge one batch's block counts into the persistent index.

    Replay-safe: if this batch_id is already recorded in the index, the
    merge is skipped (counting is not naturally idempotent)."""
    blocks = _batch_blocks(batch_df)
    agg = blocks.groupBy("block_hash").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    ).withColumn("__batch_id", F.lit(batch_id).cast("long"))
    if os.path.exists(index_path):
        prev = spark.read.parquet(index_path)
        if prev.filter(F.col("__batch_id") == batch_id).limit(1).count() > 0:
            return  # replayed batch: already merged
        merged = prev.unionByName(agg)
    else:
        merged = agg
    # compact to one row per block while preserving replay markers:
    # keep per-batch partials (the replay guard needs __batch_id); readers
    # aggregate. Rewrite via a temp dir for atomicity on local FS.
    tmp = index_path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(index_path)


def read_block_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Collapsed view: one row per block with summed counts."""
    raw = spark.read.parquet(index_path)
    return raw.groupBy("block_hash").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_occurrences").alias("n_occurrences"),
    )


def score_batch_against_index(
    spark: SparkSession, batch_df: DataFrame, index_path: str
) -> DataFrame:
    """Per-doc duplication ratio against the current index (the
    incremental q_doc_dup_ratio): a block is 'shared' when the INDEX has
    seen it in ≥2 documents."""
    blocks = _batch_blocks(batch_df)
    shared = (
        read_block_index(spark, index_path)
        .filter(F.col("n_docs") >= 2)
        .select(F.col("block_hash").alias("sh"))
    )
    joined = blocks.join(F.broadcast(shared), blocks.block_hash == shared.sh, "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(F.col("sh").isNotNull(), 1).otherwise(0)).alias("n_dup_blocks"),
        (
            F.sum(F.when(F.col("sh").isNotNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_ratio"),
    )


def block_index_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    index_path: str,
    checkpoint_dir: str,
):
    """Wire the incremental index as a checkpointed AvailableNow stream."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        update_block_index(batch_df.sparkSession, batch_df, index_path, batch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
