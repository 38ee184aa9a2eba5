"""ST-CMS — streaming count-min frequency-sketch maintenance.

Maintains a count-min sketch over an event stream — the mergeable
frequency counter (operators/graph_ext.py q_countmin: same 4x256 geometry,
same portable md5 row-hash) kept INCREMENTALLY: each micro-batch reduces
to at most rows*width counter increments, which ADD into the persisted
sketch. Addition is associative and commutative, so ANY batch split
converges to the one-shot sketch; it is NOT idempotent, so replay safety
comes from the versioned-state commit protocol instead — a batch id whose
``state=<id>/_SUCCESS`` marker already exists is skipped, making the
update exactly-once per batch id (tests/test_streaming_cms.py pins both
properties). This is the frequency telemetry a 100 TB ingest keeps
instead of exact per-key counts: state is a fixed rows*width cell grid
forever, merge traffic is at most that many rows per batch, and point
queries read min-of-d cells.

State durability follows the block-index discipline (block_index.py):
each batch writes the FULL post-merge sketch to its own
``state=<batch_id>/`` directory whose ``_SUCCESS`` marker commits it; the
reader uses the newest COMMITTED version, so a crash mid-write leaves the
previous version authoritative. Old versions are superseded, not mutated.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedup import _md5_int
from .block_index import _fs_and_path, assert_success_markers_enabled

CMS_ROWS = 4
CMS_WIDTH = 256  # q_countmin's geometry: est - exact ~ e/width * N

_STATE_SCHEMA = "r long, bucket long, cnt long"


def _bucket(r, key) -> F.Column:
    """Portable row-hash md5(r || '|' || key) % width — byte-identical to
    q_countmin's bucket derivation so stream state and the batch
    calibrator agree on every cell."""
    return (
        _md5_int(F.concat(r.cast("string"), F.lit("|"), key.cast("string")), 15)
        % CMS_WIDTH
    )


def batch_increments(batch_df: DataFrame, key_col: str) -> DataFrame:
    """(r, bucket, cnt) counter increments for one batch: one hash
    aggregate on the key, a rows-cardinality explode of the survivors,
    and a second bounded aggregate — at most rows*width output cells no
    matter the batch size."""
    keyed = batch_df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = batch_df.sparkSession.range(CMS_ROWS).select(F.col("id").alias("r"))
    return (
        keyed.crossJoin(F.broadcast(rows))
        .groupBy("r", _bucket(F.col("r"), F.col("key")).alias("bucket"))
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def merge_sketch(state: DataFrame, increments: DataFrame) -> DataFrame:
    """Elementwise cell addition — associative and commutative (any batch
    split converges); replay safety is the commit protocol's job."""
    return (
        state.unionByName(increments)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _versions(spark: SparkSession, state_path: str) -> list[tuple[int, str]]:
    fs, root, jvm = _fs_and_path(spark, state_path)
    out = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            p = st.getPath()
            name = p.getName()
            if st.isDirectory() and name.startswith("state="):
                marker = jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS")
                if fs.exists(marker):
                    out.append((int(name.split("=", 1)[1]), p.toString()))
    return sorted(out)


def read_sketch(spark: SparkSession, state_path: str) -> DataFrame:
    """The newest COMMITTED sketch version; the empty sketch before any
    batch commits (the block-index bootstrap contract)."""
    assert_success_markers_enabled(spark)
    versions = _versions(spark, state_path)
    if not versions:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return spark.read.parquet(versions[-1][1]).select("r", "bucket", "cnt")


def read_cms_estimates(
    spark: SparkSession, state_path: str, keys_df: DataFrame, key_col: str
) -> DataFrame:
    """(key, cms_estimate) point queries against the current sketch: each
    probe key joins its rows*1 cells (the sketch side is a fixed
    rows*width grid — always broadcastable) and takes the min. Keys never
    inserted read 0 via the left join's coalesce, matching CMS semantics."""
    sketch = read_sketch(spark, state_path)
    rows = spark.range(CMS_ROWS).select(F.col("id").alias("r"))
    probes = (
        keys_df.select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .crossJoin(F.broadcast(rows))
        .select("key", "r", _bucket(F.col("r"), F.col("key")).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )


def update_sketch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int,
    key_col: str,
) -> None:
    """Add one batch into the sketch and commit it as a new version.
    Replay-safe BY the version check: addition is not idempotent, so an
    already-committed batch id MUST short-circuit (this is load-bearing,
    unlike ST-KMV where skipping is merely an optimization)."""
    assert_success_markers_enabled(spark)
    vdir = posixpath.join(state_path, f"state={batch_id}")
    fs, _, jvm = _fs_and_path(spark, vdir)
    if fs.exists(jvm.org.apache.hadoop.fs.Path(posixpath.join(vdir, "_SUCCESS"))):
        return
    state = read_sketch(spark, state_path)
    merge_sketch(state, batch_increments(batch_df, key_col)).write.mode(
        "overwrite"
    ).parquet(vdir)


def cms_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    state_path: str,
    checkpoint_dir: str,
    key_col: str,
):
    """Wire the sketch maintenance as a checkpointed AvailableNow stream."""
    assert_success_markers_enabled(spark)
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        update_sketch(
            batch_df.sparkSession, batch_df, state_path, batch_id, key_col
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", posixpath.join(checkpoint_dir, "cms"))
        .trigger(availableNow=True)
        .start()
    )
