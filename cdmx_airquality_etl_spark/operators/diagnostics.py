"""Plan-tuning diagnostics: the queries an operator of a large cluster runs
BEFORE picking a physical strategy.

- q_skew_profile — join/agg-key skew report (top-key share + positional
  frequency percentiles) for candidate shuffle keys. This is the
  measurement that decides between a plain shuffle join and the salted
  plan (q_join_skew_salted / q_group_salted): salt only when top_share
  says one key owns a partition-breaking fraction.
- q_zone_map    — value-range zone statistics (min/max per key-range zone)
  plus the prune verdict for a concrete predicate: the data-skipping
  index parquet row groups / Delta file stats implement. Shows exactly
  which fraction of zones a time-range scan touches when data is laid
  out by the zone key.

Lineage: generalizes the reference's implicit layout decisions — its
report_ts-keyed tables (sql_config.yaml:6,18) are exactly the sorted-by-
ingest-time layout whose zone map makes time-range scans cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table

_ZONE_SIZE = 1000  # l_orderkey range per zone
# the demo prune predicate: a one-year ship-date scan
_PRUNE_LO = "1997-01-01"
_PRUNE_HI = "1998-01-01"


def _freq_profile_sql(table: str, key: str) -> str:
    """One profiled key as a DuckDB CTE body (see q_skew_profile)."""
    return f"""
      SELECT '{table}.{key}' AS key_name,
             CAST(SUM(f) AS BIGINT) AS n_rows,
             COUNT(*) AS n_keys,
             MAX(f) AS max_freq,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN f END) AS p50_freq,
             MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN f END) AS p90_freq,
             MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN f END) AS p99_freq,
             CAST(MAX(f) AS DOUBLE) / CAST(SUM(f) AS DOUBLE) AS top_share
      FROM (
        SELECT f,
               row_number() OVER (ORDER BY f, k) AS rn,
               COUNT(*) OVER () AS n
        FROM (SELECT {key} AS k, COUNT(*) AS f FROM {table} GROUP BY {key})
      )
    """


@register(
    "q_skew_profile",
    oracle=f"""
    {_freq_profile_sql('orders', 'o_custkey')}
    UNION ALL
    {_freq_profile_sql('lineitem', 'l_partkey')}
    UNION ALL
    {_freq_profile_sql('events', 'user_id')}
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-frequency skew report for three candidate shuffle keys: row and
    key counts, the hottest key's frequency, positional p50/p90/p99 of the
    per-key frequency distribution, and top_share = max_freq / n_rows (the
    number that triggers salting).

    Each profile is one hash aggregate over the key plus one ranked pass
    over the (much smaller) frequency table — at 100 TB the frequency
    table is |distinct keys| rows, and a production profiler would sample
    or sketch it; the report shape stays identical. Percentiles are
    POSITIONAL (element at ceil(q·n), ties ordered by (freq, key)) so both
    engines emit identical integers; top_share is the single double
    division."""

    def profile(df: DataFrame, table: str, key: str) -> DataFrame:
        freq = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("f")
        )
        w = Window.orderBy(F.col("f").asc(), F.col("k").asc())
        ranked = freq.select(
            "f",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        pick = (
            lambda cond, name: F.max(F.when(cond, F.col("f"))).alias(name)
        )
        return ranked.agg(
            F.max(F.lit(f"{table}.{key}")).alias("key_name"),
            F.sum("f").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("f").alias("max_freq"),
            pick(F.col("rn") == F.expr("(n + 1) DIV 2"), "p50_freq"),
            pick(F.col("rn") == F.expr("(n * 9 + 9) DIV 10"), "p90_freq"),
            pick(F.col("rn") == F.expr("(n * 99 + 99) DIV 100"), "p99_freq"),
            (
                F.max("f").cast("double") / F.sum("f").cast("double")
            ).alias("top_share"),
        ).select(
            "key_name",
            "n_rows",
            "n_keys",
            "max_freq",
            "p50_freq",
            "p90_freq",
            "p99_freq",
            "top_share",
        )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return (
        profile(orders, "orders", "o_custkey")
        .unionByName(profile(lineitem, "lineitem", "l_partkey"))
        .unionByName(profile(events, "events", "user_id"))
    )


@register(
    "q_zone_map",
    oracle=f"""
    SELECT l_orderkey // {_ZONE_SIZE} AS zone,
           COUNT(*) AS n_rows,
           strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           (MAX(l_shipdate) < TIMESTAMP '{_PRUNE_LO}'
            OR MIN(l_shipdate) >= TIMESTAMP '{_PRUNE_HI}') AS pruned
    FROM lineitem
    GROUP BY zone
    """,
)
def q_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map statistics over lineitem laid out by order key: per
    {_ZONE_SIZE}-key zone, row count, ship-date and price min/max, and
    whether a concrete one-year ship-date scan could SKIP the zone
    entirely (max < lo or min >= hi — the no-false-negative prune rule).

    This is the operator behind data skipping: parquet keeps these stats
    per row group, Delta/Iceberg per file; Catalyst's filter pushdown
    consumes them for free when the predicate column correlates with the
    layout. The query both materializes the index (one hash aggregate, no
    shuffle beyond it) and reports its effectiveness — on a time-correlated
    layout most zones prune; on a random layout none do, which is the
    signal to re-cluster. All emitted values are data elements or counts;
    the prune verdict is integer/timestamp comparison only."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit(_PRUNE_LO).cast("timestamp")
    hi = F.lit(_PRUNE_HI).cast("timestamp")
    return (
        li.groupBy(
            F.expr(f"l_orderkey DIV {_ZONE_SIZE}").alias("zone")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            (
                (F.max("l_shipdate") < lo) | (F.min("l_shipdate") >= hi)
            ).alias("pruned"),
        )
    )
