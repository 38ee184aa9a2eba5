"""Stream-stream interval join and watermarked stream deduplication.

ST-JOIN: the streaming form of q_asof_join/q_range_join — two event streams
joined on key within an event-time interval. Both sides carry watermarks so
the join state store can evict rows once no future match is possible; without
the time bound the state would grow unboundedly (Spark rejects that plan).

ST-DEDUP: dropDuplicatesWithinWatermark — the streaming form of q_dedup_keys
/ the PK invariant (sql_config.yaml:18): re-delivered snapshots inside the
watermark horizon dedup by key, state evicts after the horizon. This is how
the reference's hourly re-scrape idempotency (scrapper.py:197-206) looks when
the scheduler-level incrementality moves into the engine.

Both operators are batch-equivalent on a closed input (AvailableNow) — the
property the tests assert, per SURVEY.md §2B's note on non-oracle ST-* rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """left ⋈ right on key, right.ts in [left.ts, left.ts + horizon).
    Works on streaming inputs (watermarks applied) and batch inputs
    (watermark is a no-op) — the equivalence contract."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col(id_col).alias("l_event_id"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col(id_col).alias("r_event_id"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("l_key", "l_event_id", "r_event_id", "l_ts", "r_ts")


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first delivery per key within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)
