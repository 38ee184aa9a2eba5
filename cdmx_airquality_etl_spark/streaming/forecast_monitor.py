"""ST-HW — streaming forecast maintenance.

Maintains the daily event-count series INCREMENTALLY over an event stream
(exact BIGINT counts per day, merged additively under the versioned-commit
contract) and reads back q_holt_winters' full smoothing table from the
maintained state — the forecasting monitor run the way production runs it,
refit on arriving data instead of a nightly rebuild. Because the state IS
the day-grain series (bounded by the calendar, not the corpus) and the fit
is the SAME `hw_from_daily` fold the batch operator uses, the final
trajectory equals the batch q_holt_winters output bitwise
(tests/test_streaming_forecast.py pins it).

Replay safety follows ST-AB (streaming/ab_monitor.py): day-count addition
is associative/commutative but NOT idempotent, so each batch writes the
full post-merge day-grain state to its own ``state=<batch_id>/`` directory
committed by ``_SUCCESS``, and an already-committed batch id is skipped.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.timeseries import hw_from_daily
from .block_index import _fs_and_path, assert_success_markers_enabled

_STATE_SCHEMA = "d long, y long"


def batch_daily(batch_df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One batch's (day, count) increments — the q_holt_winters day grain."""
    d = F.datediff(
        F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    return batch_df.groupBy(d.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )


def merge_daily(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Per-day BIGINT addition — associative and commutative, so batch
    splits and arrival order cannot change the maintained series."""
    return (
        state.unionByName(batch)
        .groupBy("d")
        .agg(F.sum("y").cast("long").alias("y"))
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


def read_daily_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The newest COMMITTED day-count series; empty before any commit."""
    assert_success_markers_enabled(spark)
    versions = _versions(spark, state_path)
    if not versions:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return spark.read.parquet(versions[-1][1]).select("d", "y")


def update_daily_state(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    batch_id: int,
    ts_col: str = "ts",
) -> None:
    """Merge one batch's day counts into the state and commit it as a new
    version; an already-committed batch id is skipped (re-adding would
    double-count — the versioned commit is the replay guarantee)."""
    assert_success_markers_enabled(spark)
    vdir = posixpath.join(state_path, f"state={batch_id}")
    fs, _, jvm = _fs_and_path(spark, vdir)
    if fs.exists(jvm.org.apache.hadoop.fs.Path(posixpath.join(vdir, "_SUCCESS"))):
        return
    state = read_daily_state(spark, state_path)
    merge_daily(state, batch_daily(batch_df, ts_col)).write.mode(
        "overwrite"
    ).parquet(vdir)


def read_forecast(spark: SparkSession, state_path: str) -> DataFrame:
    """q_holt_winters' smoothing table (day, y, level, trend, seasonal,
    fitted, resid) refit on the maintained series — the SAME fold the
    batch operator runs, so once the stream has drained the full source
    the rows match the batch query bitwise. Series shorter than two
    seasons return empty, exactly like the batch form."""
    return hw_from_daily(read_daily_state(spark, state_path))


def forecast_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    state_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
):
    """Wire the day-count maintenance as a checkpointed AvailableNow
    stream, one file per trigger."""
    assert_success_markers_enabled(spark)
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        update_daily_state(
            batch_df.sparkSession, batch_df, state_path, batch_id, ts_col
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", posixpath.join(checkpoint_dir, "hw"))
        .trigger(availableNow=True)
        .start()
    )
