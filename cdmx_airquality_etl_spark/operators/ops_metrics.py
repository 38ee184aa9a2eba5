"""Operational-metrics batch: day-of-week seasonality indices, order
cycle-time statistics, and backlog aging buckets.

Lineage: the reference's hourly snapshots exist to feed exactly these
operational reports (SURVEY §2B) — when is traffic heaviest, how long do
orders take to start shipping, and what is sitting unshipped right now.
Each is one scan + one small aggregate.

Determinism: counts and day arithmetic are exact integers; seasonal
indices and averages are single divisions of exact sums (the seasonal
index cross-multiplies — (dow_sum · n_days_total) / (dow_days · total) —
so no intermediate float mean is compared)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table

_AGE_BUCKET_DAYS = 365  # backlog aging bucket width


# ---------------------------------------------------------------------------
# q_seasonal_profile — day-of-week activity index
# ---------------------------------------------------------------------------
@register(
    "q_seasonal_profile",
    oracle="""
    WITH d AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
      FROM events
    ),
    daily AS (
      SELECT day, day % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY day
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(n) AS BIGINT) AS total
      FROM daily
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days_dow,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(CAST(SUM(n) * MAX(g.n_days) AS DOUBLE)
                / CAST(COUNT(*) * MAX(g.total) AS DOUBLE) AS DOUBLE) AS seasonal_index
    FROM daily CROSS JOIN g
    GROUP BY dow
    """,
)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: mean daily volume on each weekday
    slot over the all-days mean — 1.0 is flat, >1 a hot day. The index
    cross-multiplies exact integers ((Σn_dow · days_total) / (days_dow ·
    Σn_total)) so no float mean is ever compared; dow = epoch-day mod 7
    (locale-free, the q_chi_square convention — the same dimension that
    query tests for independence, profiled here as a ratio). Daily grain
    after one map-combined shuffle."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    daily = ev.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("dow", F.col("day") % 7)
    g = daily.agg(F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("total"))
    return (
        daily.crossJoin(F.broadcast(g))
        .groupBy(F.col("dow").cast("bigint").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days_dow"),
            F.sum("n").alias("n_events"),
            (
                (F.sum("n") * F.max("n_days")).cast("double")
                / (F.count(F.lit(1)) * F.max("total")).cast("double")
            ).alias("seasonal_index"),
        )
    )


# ---------------------------------------------------------------------------
# q_order_cycle_time — order-to-first/last-ship latency per priority
# ---------------------------------------------------------------------------
@register(
    "q_order_cycle_time",
    oracle="""
    WITH per_order AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(MIN(l_shipdate) AS DATE)) AS BIGINT) AS first_ship_days,
             CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(MAX(l_shipdate) AS DATE)) AS BIGINT) AS last_ship_days
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderpriority, o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(first_ship_days) AS BIGINT) AS min_first_ship,
           CAST(CAST(SUM(first_ship_days) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_first_ship,
           CAST(MAX(last_ship_days) AS BIGINT) AS max_last_ship,
           CAST(CAST(SUM(last_ship_days) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_last_ship
    FROM per_order
    GROUP BY o_orderpriority
    """,
)
def q_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order cycle time: calendar days from order placement to first and
    last line shipment, aggregated per priority — the fulfillment-SLA
    report (urgent orders should show smaller numbers; this corpus's
    generator does not enforce that, which is exactly what the report
    exists to reveal). Two-level aggregate: per-order min/max ship dates
    (one shuffle on the order key), then tiny per-priority stats;
    averages are single divisions of exact integer day sums."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(F.min("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("bigint").alias("first_ship_days"),
            F.datediff(F.max("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("bigint").alias("last_ship_days"),
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("first_ship_days").alias("min_first_ship"),
        (F.sum("first_ship_days").cast("double") / F.count(F.lit(1))).alias("avg_first_ship"),
        F.max("last_ship_days").alias("max_last_ship"),
        (F.sum("last_ship_days").cast("double") / F.count(F.lit(1))).alias("avg_last_ship"),
    )


# ---------------------------------------------------------------------------
# q_backlog_aging — open orders bucketed by age as of the corpus horizon
# ---------------------------------------------------------------------------
@register(
    "q_backlog_aging",
    oracle=f"""
    WITH horizon AS (SELECT MAX(o_orderdate) AS h FROM orders),
    open_orders AS (
      SELECT o_orderpriority,
             CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(h AS DATE)) AS BIGINT) AS age_days
      FROM orders, horizon
      WHERE o_orderstatus = 'O'
    )
    SELECT o_orderpriority,
           CAST(age_days // {_AGE_BUCKET_DAYS} AS BIGINT) AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_open,
           CAST(MAX(age_days) AS BIGINT) AS oldest_days
    FROM open_orders
    GROUP BY o_orderpriority, age_days // {_AGE_BUCKET_DAYS}
    """,
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging: open ('O') orders bucketed by age in {w}-day bands
    as of the corpus horizon (MAX order date — data-derived, so the
    report is reproducible on any snapshot without a wall-clock
    dependency, the q_rfm recency convention). The classic accounts-
    receivable-style aging report; a healthy pipeline shows mass in the
    youngest bucket. Ages are non-negative by construction (horizon =
    max), so integer division buckets identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    horizon = orders.agg(F.max("o_orderdate").alias("h"))
    open_orders = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_orderpriority",
            F.datediff(F.col("h").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("bigint").alias("age_days"),
        )
    )
    return open_orders.groupBy(
        "o_orderpriority",
        F.expr(f"age_days div {_AGE_BUCKET_DAYS}").cast("bigint").alias("age_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_open"),
        F.max("age_days").alias("oldest_days"),
    )


q_backlog_aging.__doc__ = q_backlog_aging.__doc__.format(w=_AGE_BUCKET_DAYS)
