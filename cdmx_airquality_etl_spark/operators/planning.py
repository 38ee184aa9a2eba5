"""Layout/allocation planning operators: the metadata-sized decisions a
100 TB deployment computes ON the engine (never on the driver) — file
compaction binning, Pareto frontiers, integer quota apportionment, and
weighted medians.

- q_compaction_plan  — Delta-OPTIMIZE-style small-file compaction planner:
                       per partition, greedily bin files toward a target
                       size via a prefix-sum window. The reference's
                       append-per-hour model (C-SCHED, scrapper.py:44-52 —
                       one snapshot per scheduled run) is exactly the
                       small-file generator this op exists to repair.
- q_pareto_frontier  — 2D skyline (minimize size, maximize price) via sort
                       + running-max windows: O(n log n), never the O(n²)
                       pairwise dominance join.
- q_quota_allocation — largest-remainder (Hamilton) apportionment of a
                       fixed sample budget across document sources: the
                       integer-exact form of mixing-weight sampling
                       (complements q_mixing_weights' rate view).
- q_weighted_median  — quantity-weighted lower median per group via an
                       exact DECIMAL prefix sum — the robust per-group
                       statistic q_outlier_mad uses, generalized to
                       weighted data.

Exactness: every decision is integer/DECIMAL arithmetic over windows
(bin ids, ranks, quotas, cumulative weights) — order-free given the
pinned total orders, hence engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table

_COMPACT_TARGET_ROWS = 256
_QUOTA_BUDGET = 10_000


# ---------------------------------------------------------------------------
# q_compaction_plan — greedy prefix binning of hourly files per day
# ---------------------------------------------------------------------------
@register(
    "q_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT strftime(ts, '%Y-%m-%d') AS part_day,
             CAST(hour(ts) AS BIGINT) AS file_seq,
             COUNT(*) AS n_rows
      FROM events
      GROUP BY 1, 2
    ), binned AS (
      SELECT part_day, file_seq, n_rows,
             CAST((SUM(n_rows) OVER (PARTITION BY part_day ORDER BY file_seq
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_rows) // {_COMPACT_TARGET_ROWS} AS BIGINT) AS bin_id
      FROM files
    )
    SELECT part_day, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS total_rows,
           COUNT(*) > 1 AS needs_compaction
    FROM binned
    GROUP BY part_day, bin_id
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: model each (day, hour) event batch as a
    file (the shape an hourly streaming sink leaves behind), then assign
    file f to bin floor(prefix_rows_before_f / target) within its day —
    the greedy accumulate-toward-target rule OPTIMIZE uses, expressed as
    ONE prefix-sum window over the file manifest. Bins with >1 file are
    the rewrite units.

    Scale: the manifest is metadata (one row per file — millions of rows
    at 100 TB, not billions); the plan is a window + hash agg over it.
    The actual rewrite this plan drives would read only flagged bins —
    never the already-compacted majority."""
    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("part_day"),
        F.hour("ts").cast("long").alias("file_seq"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = (
        Window.partitionBy("part_day")
        .orderBy("file_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = files.select(
        "part_day",
        "file_seq",
        "n_rows",
        ((F.sum("n_rows").over(w) - F.col("n_rows")) / _COMPACT_TARGET_ROWS)
        .cast("long")
        .alias("bin_id"),
    )
    return (
        binned.groupBy("part_day", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("total_rows"),
        )
        .select(
            "part_day",
            "bin_id",
            "n_files",
            "total_rows",
            (F.col("n_files") > 1).alias("needs_compaction"),
        )
    )


# ---------------------------------------------------------------------------
# q_pareto_frontier — 2D skyline: minimize p_size, maximize p_retailprice
# ---------------------------------------------------------------------------
@register(
    "q_pareto_frontier",
    oracle="""
    WITH m AS (
      SELECT p_partkey, p_size, p_retailprice,
             MAX(p_retailprice) OVER (
               ORDER BY p_size
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_smaller,
             MAX(p_retailprice) OVER (PARTITION BY p_size) AS best_same
      FROM part
    )
    SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_retailprice
    FROM m
    WHERE (best_smaller IS NULL OR p_retailprice > best_smaller)
      AND p_retailprice = best_same
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over (p_size ↓ better, p_retailprice ↑ better).
    Dominance (q ≤ size, q ≥ price, strict in one) is decided by two
    windows — running max price over STRICTLY smaller sizes (range frame)
    and max price within the same size — so the skyline costs one sort
    instead of the O(n²) pairwise dominance join. Equal (size, price)
    pairs are mutually non-dominating and both kept, making the result a
    set, not an order-dependent pick.

    Scale: a global range-frame window implies a single-partition sort at
    the limit; the standard 100 TB refinement pre-aggregates max price per
    size (|distinct sizes| rows) and broadcasts that tiny frontier-of-
    aggregates — same result, done here in the direct form because the
    skyline input after the per-size max is already value-domain-sized."""
    part = load_table(spark, sf_dir, "part")
    w_smaller = (
        Window.orderBy("p_size").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_size")
    m = part.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.max("p_retailprice").over(w_smaller).alias("best_smaller"),
        F.max("p_retailprice").over(w_same).alias("best_same"),
    )
    return m.filter(
        (
            F.col("best_smaller").isNull()
            | (F.col("p_retailprice") > F.col("best_smaller"))
        )
        & (F.col("p_retailprice") == F.col("best_same"))
    ).select(
        "p_partkey", F.col("p_size").cast("long").alias("p_size"), "p_retailprice"
    )


# ---------------------------------------------------------------------------
# q_quota_allocation — Hamilton largest-remainder apportionment
# ---------------------------------------------------------------------------
@register(
    "q_quota_allocation",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), shares AS (
      SELECT source, n_docs,
             SUM(n_docs) OVER () AS total,
             (n_docs * {_QUOTA_BUDGET}) // SUM(n_docs) OVER () AS floor_alloc,
             (n_docs * {_QUOTA_BUDGET}) % SUM(n_docs) OVER () AS remainder
      FROM counts
    ), ranked AS (
      SELECT source, n_docs, floor_alloc,
             ROW_NUMBER() OVER (ORDER BY remainder DESC, source) AS rk,
             {_QUOTA_BUDGET} - SUM(floor_alloc) OVER () AS leftover
      FROM shares
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    """,
)
def q_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed sample budget
    of {_QUOTA_BUDGET} slots across document sources, proportional to doc
    counts: floor the exact integer shares, then hand the leftover slots
    to the largest remainders (ties → source name). Allocations sum to the
    budget EXACTLY — the property rate-based sampling (q_mixing_weights,
    q_stratified_sample) cannot give you — and every step is integer
    arithmetic, so the plan is reproducible anywhere.

    Scale: runs on the per-source aggregate (thousands of rows at most);
    the unpartitioned windows are over that tiny table, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    shares = counts.select(
        "source",
        "n_docs",
        F.expr(f"(n_docs * {_QUOTA_BUDGET}) DIV sum(n_docs) OVER ()").alias(
            "floor_alloc"
        ),
        F.expr(f"(n_docs * {_QUOTA_BUDGET}) % sum(n_docs) OVER ()").alias(
            "remainder"
        ),
    )
    ranked = shares.select(
        "source",
        "n_docs",
        "floor_alloc",
        F.row_number()
        .over(Window.orderBy(F.col("remainder").desc(), "source"))
        .alias("rk"),
        (F.lit(_QUOTA_BUDGET) - F.sum("floor_alloc").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (
            F.col("floor_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# q_weighted_median — quantity-weighted lower median price per group
# ---------------------------------------------------------------------------
@register(
    "q_weighted_median",
    oracle="""
    WITH ordered AS (
      SELECT l_returnflag,
             l_extendedprice AS price,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS w,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MAX(tw) AS BIGINT) AS total_weight_cq,
           MIN(CASE WHEN 2 * cw >= tw THEN price END) AS weighted_median_price
    FROM ordered
    GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted LOWER median of extended price per return flag:
    the first price (in the pinned total order price → orderkey → lineno)
    whose cumulative weight reaches half the group total. Weights ride as
    exact centi-quantity BIGINTs so the 2·cw ≥ tw threshold is integer
    comparison — no floating-point accumulation order to disagree on.

    Plan: one shuffle on the group key serves both windows (cumulative and
    total), then a hash-agg MIN picks the crossing row — same cost shape
    as q_percentile_cont's exact positional selection."""
    li = load_table(spark, sf_dir, "lineitem")
    w_cents = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("l_returnflag")
    ordered = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        "l_orderkey",
        "l_linenumber",
        w_cents.alias("w"),
    ).select(
        "l_returnflag",
        "price",
        F.sum("w").over(cum).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )
    return ordered.groupBy("l_returnflag").agg(
        F.max("tw").cast("long").alias("total_weight_cq"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price"))).alias(
            "weighted_median_price"
        ),
    )
