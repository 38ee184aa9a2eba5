"""Streaming JOIN-view maintenance — the ivm_join fact path as a stream.

Fact files land in a directory; each micro-batch materializes ``ΔA ⋈ B``
into its own committed ``batch=<id>/`` subdirectory of the view
(the plans/ivm_join delta-join algebra under the block-index commit
protocol). Composes the corpus-ingest streaming skeleton (checkpointed
file source, AvailableNow per scheduled run, foreachBatch) with the
delta-join algebra, giving the continuously-maintained star-join view a
warehouse actually serves queries from.

Exactly-once (the real story, not the optimistic one): foreachBatch is
at-least-once — a crash after a batch's write commits but before the
streaming checkpoint commits REPLAYS the batch, and a plain parquet
append would double-append its ΔA⋈B rows. The guard is the same
batch-id ``_SUCCESS``-marker commit protocol as streaming/block_index /
cms / kmv / ab: each batch writes to its own ``batch=<id>/``
subdirectory with mode('overwrite'); a replayed id whose ``_SUCCESS``
marker exists is skipped; a crashed half-written batch lacks the marker,
is invisible to :func:`read_view`, and is overwritten in place on
restart — prior batches' durable state is never touched.

Scale notes: per batch the work is O(|ΔA|) — the dimension broadcasts,
the batch write touches only its own subdirectory, and nothing rescans
the accumulated view or fact history. read_view is one multi-dir parquet
scan (no shuffle); periodic compaction of old batch dirs is
plans/maintenance.compact's job, same as any append-heavy table.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..hadoop_fs import fs_and_path
from ..plans.ivm_join import build_view
from .block_index import assert_success_markers_enabled

SEED_BATCH_ID = -1  # the pre-stream view seed lives at batch=-1


def _batch_dir(view_path: str, batch_id: int) -> str:
    return posixpath.join(view_path, f"batch={batch_id}")


def _is_committed(spark: SparkSession, bdir: str) -> bool:
    fs, _, jvm = fs_and_path(spark, bdir)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(posixpath.join(bdir, "_SUCCESS")))


def _assert_no_batch_column(df: DataFrame, where: str) -> None:
    """Fail loudly if the view schema carries a data column named
    ``batch``: read_view discovers the ``batch=<id>`` partition dirs via
    basePath and then drops that inferred column — a same-named data
    column would collide with the partition column and the drop would
    silently destroy user data. Validated at write time (seed + every
    delta), where the caller can still rename, rather than detected at
    read time when the data is already ambiguous on disk."""
    if "batch" in df.columns:
        raise ValueError(
            f"{where}: view schema must not contain a column named 'batch' "
            f"— it collides with the batch=<id> partition directory column "
            f"that read_view infers and drops. Rename the column before "
            f"writing (columns: {df.columns})."
        )


def apply_fact_delta_versioned(
    spark: SparkSession,
    view_path: str,
    a_delta: DataFrame,
    b: DataFrame,
    key: str,
    batch_id: int,
) -> bool:
    """Materialize one batch's ``ΔA ⋈ B`` into its committed subdirectory.

    Replay-safe: an id whose ``_SUCCESS`` exists short-circuits (the
    append is not idempotent, so this is load-bearing, the ST-CMS rule).
    Crash-safe: a half-written dir lacks the marker — it is both skipped
    by read_view and overwritten here on retry. Returns True when the
    batch was (re)written, False when skipped as already committed."""
    assert_success_markers_enabled(spark)
    bdir = _batch_dir(view_path, batch_id)
    if _is_committed(spark, bdir):
        return False
    view = build_view(a_delta, b, key)
    _assert_no_batch_column(view, "apply_fact_delta_versioned")
    view.write.mode("overwrite").parquet(bdir)
    return True


def seed_view(view_df: DataFrame, view_path: str) -> None:
    """Write the initial (pre-stream) view state as the committed seed
    batch, so the seed and every later delta live under one uniform
    commit protocol."""
    _assert_no_batch_column(view_df, "seed_view")
    view_df.write.mode("overwrite").parquet(_batch_dir(view_path, SEED_BATCH_ID))


def read_view(spark: SparkSession, view_path: str) -> DataFrame:
    """The queryable view: union of all COMMITTED batch subdirectories.
    Uncommitted (crashed, in-flight) batch dirs are excluded by the same
    marker check the writer's replay guard uses. Raises on a view with no
    committed state — an unseeded view is a caller bug, not an empty
    relation (the schema is unknowable here)."""
    assert_success_markers_enabled(spark)
    fs, root, jvm = fs_and_path(spark, view_path)
    committed: list[str] = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            p = st.getPath()
            if st.isDirectory() and p.getName().startswith("batch="):
                if fs.exists(jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS")):
                    committed.append(p.toString())
    if not committed:
        raise FileNotFoundError(
            f"no committed batches under view {view_path!r} — seed_view first"
        )
    raw = spark.read.option("basePath", view_path).parquet(*sorted(committed))
    return raw.drop("batch")


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
    stream over landing fact files, one committed batch dir per
    micro-batch (replay-safe, see module docstring)."""
    stream = (
        spark.readStream.schema(fact_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(fact_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_fact_delta_versioned(
            batch_df.sparkSession, view_path, batch_df, dim, key, int(batch_id)
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
