"""Bitwise-aggregate batch: bitmap presence masks and drawdown analysis.

Lineage: extends the sketch surface with the BITMAP pattern — the
fixed-width cousin of roaring bitmaps that OLAP engines use for
presence/segment membership (a 64-bit mask aggregates with bit_or, counts
with bit_count, intersects with bit_and — all constant-size per group no
matter how many rows fold in). Drawdown adds the third member of the
prefix-identity family (CUSUM = prefix sum − prefix min; drawdown =
prefix max − current), the risk metric every cumulative-series monitor
reports.

Determinism: masks and popcounts are pure integer bit algebra; the
drawdown series is cent-scaled integer arithmetic on the daily grain."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table

_MASK_BITS = 31  # day-of-month presence fits a 31-bit mask


# ---------------------------------------------------------------------------
# q_bitmap_presence — day-presence bitmasks per event type
# ---------------------------------------------------------------------------
@register(
    "q_bitmap_presence",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % {_MASK_BITS} AS BIGINT) AS slot,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
      FROM events
    ),
    masks AS (
      SELECT event_type,
             bit_or(CAST(1 AS BIGINT) << slot) AS presence_mask,
             CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM d GROUP BY event_type
    ),
    common AS (SELECT bit_and(presence_mask) AS all_mask FROM masks)
    SELECT event_type,
           presence_mask,
           CAST(bit_count(presence_mask) AS BIGINT) AS n_slots,
           n_days,
           CAST(bit_count(all_mask) AS BIGINT) AS n_common_slots
    FROM masks CROSS JOIN common
    """,
)
def q_bitmap_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-presence bitmaps per event type: each day sets one bit of a
    {b}-bit mask (slot = epoch-day mod {b}); bit_or folds presence,
    bit_count pops the slot count, and bit_and across types yields the
    slots EVERY type was active — constant-size aggregation state
    regardless of row count, the whole point of bitmap indexes (a 10^12-
    row type still carries 8 bytes of state; compare COUNT(DISTINCT)'s
    per-day hash entries). n_slots ≤ n_days exposes the mod-fold
    collisions (equal on this ≤31-day corpus, pinned by tests). The
    cross-type intersection arrives via a one-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    d = ev.select(
        "event_type",
        (day % _MASK_BITS).alias("slot"),
        day.alias("day"),
    )
    masks = d.groupBy("event_type").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(slot AS INT))")).alias(
            "presence_mask"
        ),
        F.countDistinct("day").alias("n_days"),
    )
    common = masks.agg(F.bit_and("presence_mask").alias("all_mask"))
    return masks.crossJoin(F.broadcast(common)).select(
        "event_type",
        "presence_mask",
        F.bit_count("presence_mask").cast("bigint").alias("n_slots"),
        "n_days",
        F.bit_count("all_mask").cast("bigint").alias("n_common_slots"),
    )


q_bitmap_presence.__doc__ = q_bitmap_presence.__doc__.format(b=_MASK_BITS)


# ---------------------------------------------------------------------------
# q_drawdown — maximum drawdown of the cumulative daily net series
# ---------------------------------------------------------------------------
@register(
    "q_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE -CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS net_c
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY 1
    ),
    cum AS (
      SELECT d, net_c, SUM(net_c) OVER (ORDER BY d) AS cum_c
      FROM daily
    ),
    series AS (
      SELECT d, net_c, cum_c,
             MAX(cum_c) OVER (ORDER BY d) AS peak_c
      FROM cum
    )
    SELECT d AS day,
           CAST(CAST(cum_c AS DOUBLE) / 100.0 AS DOUBLE) AS cum_net,
           CAST(CAST(peak_c AS DOUBLE) / 100.0 AS DOUBLE) AS peak,
           CAST(CAST(peak_c - cum_c AS DOUBLE) / 100.0 AS DOUBLE) AS drawdown,
           CASE WHEN cum_c < peak_c THEN TRUE ELSE FALSE END AS underwater
    FROM series
    """,
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-drawdown series of the cumulative daily net (purchases
    positive, errors negative, cent-scaled): drawdown_t = (prefix max of
    the cumulative series) − current — the third prefix identity in the
    family (CUSUM uses prefix-sum − prefix-min; drawdown is its mirror),
    and the risk curve every cumulative monitor plots. Two stacked
    windows over the DAILY grain (the big shuffle already happened in
    the daily aggregate); all arithmetic is exact integers until the
    final /100 descale. `underwater` marks days below the running peak —
    its longest run (q_gaps_islands' machinery) is the time-underwater
    statistic."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    cents = F.round(F.col("value") * 100).cast("bigint")
    net = F.when(F.col("event_type") == "purchase", cents).otherwise(-cents)
    daily = ev.groupBy(day.alias("d")).agg(F.sum(net).alias("net_c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    series = daily.withColumn("cum_c", F.sum("net_c").over(w)).withColumn(
        "peak_c", F.max("cum_c").over(w)
    )
    return series.select(
        F.col("d").alias("day"),
        (F.col("cum_c").cast("double") / 100.0).alias("cum_net"),
        (F.col("peak_c").cast("double") / 100.0).alias("peak"),
        ((F.col("peak_c") - F.col("cum_c")).cast("double") / 100.0).alias("drawdown"),
        (F.col("cum_c") < F.col("peak_c")).alias("underwater"),
    )
