"""ST-DRIFT — streaming distribution-drift monitor.

The observability twin of the batch profile surface (q_profile_drift,
q_profile_table): as document batches land, each micro-batch's categorical
distribution (lang, source, ...) is compared against a REFERENCE profile
trained on the accepted corpus, and one (batch_id, n_rows, l1_distance,
drifted) row is appended per batch — the early-warning signal that an
upstream feed changed shape (a crawler stuck on one site, a language
filter upstream silently dropped, a format migration) BEFORE the bad
batches pollute downstream dedup/quality state.

Distance is total-variation-style L1 over category fractions:
Σ_k |p_batch(k) − p_ref(k)|, range [0, 2]. Categories missing on either
side contribute their full mass via a full-outer join with zero fill.

Scale notes: the reference profile is category-cardinality rows (|langs|,
|sources| — data-size-independent) and broadcasts; each batch pays one
bounded hash aggregate plus a category-grain join; the monitor output is
ONE row per batch. Nothing here scales with corpus size except the
scan of the batch itself.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.types import StructType

DEFAULT_THRESHOLD = 0.5  # L1 distance above which a batch counts as drifted


def category_profile(df: DataFrame, key_col: str) -> DataFrame:
    """(key, frac) distribution of a categorical column — the reference
    side of the monitor. Bounded output: one row per category."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("long").alias("n_total"))
    return counts.crossJoin(broadcast(tot)).select(
        "key", (F.col("n").cast("double") / F.col("n_total")).alias("frac")
    )


def batch_drift(batch_df: DataFrame, reference: DataFrame, key_col: str) -> DataFrame:
    """One-row frame (n_rows, l1_distance) for a batch against the
    reference profile. Full-outer on the category key so novel and
    vanished categories both contribute their full mass."""
    bp = category_profile(batch_df, key_col).withColumnRenamed("frac", "p_batch")
    rp = reference.withColumnRenamed("frac", "p_ref")
    joined = bp.join(broadcast(rp), "key", "full_outer").select(
        F.abs(
            F.coalesce(F.col("p_batch"), F.lit(0.0))
            - F.coalesce(F.col("p_ref"), F.lit(0.0))
        ).alias("d")
    )
    n_rows = batch_df.count()
    return joined.agg(
        F.lit(n_rows).cast("long").alias("n_rows"),
        F.coalesce(F.sum("d"), F.lit(0.0)).alias("l1_distance"),
    )


def read_drift_log(spark: SparkSession, out_path: str) -> DataFrame:
    """The monitor's verdict log: union of all COMMITTED per-batch rows
    (uncommitted crash leftovers excluded by the marker check, the same
    filter the writer's replay guard applies). Empty relation before any
    batch commits."""
    from .block_index import assert_success_markers_enabled
    from .cms_maintenance import _fs_and_path

    assert_success_markers_enabled(spark)
    fs, root, jvm = _fs_and_path(spark, out_path)
    committed: list[str] = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            p = st.getPath()
            if st.isDirectory() and p.getName().startswith("state="):
                if fs.exists(jvm.org.apache.hadoop.fs.Path(p, "_SUCCESS")):
                    committed.append(p.toString())
    if not committed:
        return spark.createDataFrame(
            [], "batch_id long, n_rows long, l1_distance double, drifted boolean"
        )
    return spark.read.parquet(*sorted(committed))


def drift_monitor_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    reference: DataFrame,
    key_col: str,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
):
    """Wire the monitor as a checkpointed AvailableNow stream emitting one
    (batch_id, n_rows, l1_distance, drifted) row per micro-batch. The
    reference profile is materialized ONCE up front (category-cardinality
    rows collected to a literal frame) so each batch pays no re-scan of
    the reference corpus.

    Replay-safe: foreachBatch is at-least-once, and a plain append would
    re-emit a batch's row after a crash-before-checkpoint-commit,
    double-counting drift alerts downstream. Each verdict row therefore
    commits to its own ``state=<batch_id>/`` subdirectory under the
    block-index ``_SUCCESS``-marker protocol — a replayed committed id is
    skipped, a crashed half-write lacks the marker, is invisible to
    :func:`read_drift_log`, and is overwritten on retry."""
    from .block_index import assert_success_markers_enabled
    from .cms_maintenance import _fs_and_path

    assert_success_markers_enabled(spark)
    ref_rows = reference.collect()  # bounded: one row per category
    ref_lit = spark.createDataFrame(ref_rows, reference.schema)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        vdir = posixpath.join(out_path, f"state={int(batch_id)}")
        fs, _, jvm = _fs_and_path(sess, vdir)
        if fs.exists(jvm.org.apache.hadoop.fs.Path(posixpath.join(vdir, "_SUCCESS"))):
            return  # replayed, fully-committed batch
        row = batch_drift(batch_df, ref_lit, key_col).collect()[0]
        sess.createDataFrame(
            [
                (
                    int(batch_id),
                    int(row["n_rows"]),
                    float(row["l1_distance"]),
                    bool(row["l1_distance"] > threshold),
                )
            ],
            "batch_id long, n_rows long, l1_distance double, drifted boolean",
        ).coalesce(1).write.mode("overwrite").parquet(vdir)

    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", posixpath.join(checkpoint_dir, "drift"))
        .trigger(availableNow=True)
        .start()
    )
