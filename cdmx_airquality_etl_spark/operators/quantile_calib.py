"""Quantile-estimation calibration + ranking tie semantics.

Lineage: extends the estimator-calibration family (q_kmv_distinct,
q_countmin, q_capture_recapture, q_ann_recall) with the quantile
estimator every engine ships as approx_percentile — here made
oracle-checkable by replacing the engine-specific t-digest/KLL internals
with a DETERMINISTIC stride sample (the IVF coreset convention), whose
positional quantiles both engines compute identically. And pins the
row_number / rank / dense_rank tie divergence — the top-k-with-ties trap
(retaining "top 3 by banded price" returns different row counts under
each function, and a ported report that swaps one for another silently
changes its result).

Determinism: positional quantile selection is exact integer rank
arithmetic (the q_percentile_cont discipline); band keys and tie counts
are exact integers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table

_STRIDE = 20  # deterministic 5% sample: o_orderkey % 20 == 0
_TIE_K = 3
_BAND = 1000  # price band width for the tie-prone ordering


# ---------------------------------------------------------------------------
# q_sample_quantile_error — stride-sample medians calibrated against exact
# ---------------------------------------------------------------------------
@register(
    "q_sample_quantile_error",
    oracle=f"""
    WITH ranked_full AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    exact AS (
      SELECT o_orderpriority,
             CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS DOUBLE) AS exact_median,
             CAST(MAX(n) AS BIGINT) AS n_full
      FROM ranked_full GROUP BY o_orderpriority
    ),
    ranked_sample AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders WHERE o_orderkey % {_STRIDE} = 0
    ),
    est AS (
      SELECT o_orderpriority,
             CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS DOUBLE) AS est_median,
             CAST(MAX(n) AS BIGINT) AS n_sample
      FROM ranked_sample GROUP BY o_orderpriority
    )
    SELECT exact.o_orderpriority, n_full, n_sample, exact_median, est_median,
           CAST(abs(est_median - exact_median) AS DOUBLE) AS abs_err,
           CAST(abs(est_median - exact_median) / exact_median AS DOUBLE) AS rel_err
    FROM exact JOIN est USING (o_orderpriority)
    """,
)
def q_sample_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-estimator calibration: the per-priority median estimated
    from a deterministic 1/{s} stride sample vs the exact median, with
    absolute and relative error — the oracle-checkable stand-in for
    approx_percentile (whose t-digest internals are engine-specific and
    would force a rows-only check; a stride sample gives the same
    error-vs-cost tradeoff AND a reproducible answer). Median selection
    is positional (lower median, rn = (n+1) div 2, total tiebreak) — the
    q_percentile_disc discipline. The sample-side window is 1/{s} the
    size; at 100 TB the stride filter pushes into the scan and only the
    sample is ever sorted."""
    orders = load_table(spark, sf_dir, "orders")

    # (n + 1) div 2 truncates identically to DuckDB's `//` on positives
    def median_of(df: DataFrame, n_alias: str, m_alias: str) -> DataFrame:
        w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
        wn = Window.partitionBy("o_orderpriority")
        ranked = df.select(
            "o_orderpriority", "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        return ranked.groupBy("o_orderpriority").agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col("o_totalprice")
                ).otherwise(None)
            ).cast("double").alias(m_alias),
            F.max("n").alias(n_alias),
        )

    exact = median_of(orders, "n_full", "exact_median")
    sample = median_of(
        orders.filter(F.col("o_orderkey") % _STRIDE == 0), "n_sample", "est_median"
    )
    return exact.join(sample, "o_orderpriority").select(
        "o_orderpriority", "n_full", "n_sample", "exact_median", "est_median",
        F.abs(F.col("est_median") - F.col("exact_median")).alias("abs_err"),
        (
            F.abs(F.col("est_median") - F.col("exact_median")) / F.col("exact_median")
        ).alias("rel_err"),
    )


q_sample_quantile_error.__doc__ = q_sample_quantile_error.__doc__.format(s=_STRIDE)


# ---------------------------------------------------------------------------
# q_topk_ties — row_number vs rank vs dense_rank retention counts
# ---------------------------------------------------------------------------
@register(
    "q_topk_ties",
    oracle=f"""
    WITH banded AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice / {_BAND}) AS BIGINT) AS price_band,
             o_orderkey
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY price_band DESC, o_orderkey) AS rn,
             rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY price_band DESC) AS rk,
             dense_rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY price_band DESC) AS dr
      FROM banded
    )
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN rn <= {_TIE_K} THEN 1 ELSE 0 END) AS BIGINT) AS kept_row_number,
           CAST(SUM(CASE WHEN rk <= {_TIE_K} THEN 1 ELSE 0 END) AS BIGINT) AS kept_rank,
           CAST(SUM(CASE WHEN dr <= {_TIE_K} THEN 1 ELSE 0 END) AS BIGINT) AS kept_dense_rank
    FROM r GROUP BY o_orderpriority
    """,
)
def q_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} retention under the three ranking functions, ordered by a
    tie-PRONE key (price banded to {b}-wide buckets): row_number keeps
    exactly {k} rows per group (with a total tiebreak), rank keeps every
    row tied into the top {k} positions (gaps after ties), dense_rank
    keeps every row in the top {k} DISTINCT bands — three different
    answers to "top 3", and a ported report that swaps one for another
    silently changes row counts. The invariant kept_row_number ≤
    kept_rank ≤ kept_dense_rank is pinned by tests. rank/dense_rank
    deliberately omit the tiebreak column: tie groups must stay tied for
    the semantics to show."""
    orders = load_table(spark, sf_dir, "orders")
    banded = orders.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / _BAND).cast("bigint").alias("price_band"),
        "o_orderkey",
    )
    w_total = Window.partitionBy("o_orderpriority").orderBy(
        F.col("price_band").desc(), "o_orderkey"
    )
    w_ties = Window.partitionBy("o_orderpriority").orderBy(F.col("price_band").desc())
    r = banded.select(
        "o_orderpriority",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_ties).alias("rk"),
        F.dense_rank().over(w_ties).alias("dr"),
    )
    return r.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("rn") <= _TIE_K, 1).otherwise(0)).alias("kept_row_number"),
        F.sum(F.when(F.col("rk") <= _TIE_K, 1).otherwise(0)).alias("kept_rank"),
        F.sum(F.when(F.col("dr") <= _TIE_K, 1).otherwise(0)).alias("kept_dense_rank"),
    )


q_topk_ties.__doc__ = q_topk_ties.__doc__.format(k=_TIE_K, b=_BAND)


# ---------------------------------------------------------------------------
# q_approx_quantile_band — the real t-digest sketch under its rank guarantee
# ---------------------------------------------------------------------------
_APQ_ACC = 1000  # approx_percentile accuracy: rank error <= n / accuracy


@register(
    "q_approx_quantile_band",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    bands AS (
      SELECT o_orderpriority,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END)
                  AS DOUBLE) AS exact_median,
             CAST(MAX(CASE WHEN rn = greatest(1, (n + 1) // 2 - (n // {_APQ_ACC} + 1))
                           THEN o_totalprice END) AS DOUBLE) AS band_lo,
             CAST(MAX(CASE WHEN rn = least(n, (n + 1) // 2 + (n // {_APQ_ACC} + 1))
                           THEN o_totalprice END) AS DOUBLE) AS band_hi
      FROM ranked GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n, exact_median, band_lo, band_hi,
           CAST(1 AS BIGINT) AS sketch_within_band
    FROM bands
    """,
)
def q_approx_quantile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL percentile sketch under its own contract: Spark's
    approx_percentile guarantees rank error <= n/accuracy, so the check
    selects the exact values at ranks median +/- (n div {acc} + 1) — the
    guarantee translated to value space with exact rank arithmetic — and
    flags whether the sketch estimate landed inside. Complements
    q_sample_quantile_error (which swaps the sketch for a deterministic
    sample): here the engine-specific t-digest RUNS and its guarantee is
    what's pinned, the q_group_approx calibration move. A sketch
    violating its rank bound flips the flag and fails the value-hash. At
    100 TB the sketch side is the one you'd keep: mergeable, one pass, no
    per-group sort; the exact band derivation is the audit harness."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = F.expr("(n + 1) div 2")
    err = F.expr(f"n div {_APQ_ACC} + 1")
    bands = ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == mid, F.col("o_totalprice")))
        .cast("double")
        .alias("exact_median"),
        F.max(
            F.when(F.col("rn") == F.greatest(F.lit(1), mid - err), F.col("o_totalprice"))
        )
        .cast("double")
        .alias("band_lo"),
        F.max(
            F.when(F.col("rn") == F.least(F.col("n"), mid + err), F.col("o_totalprice"))
        )
        .cast("double")
        .alias("band_hi"),
    )
    sketch = orders.groupBy("o_orderpriority").agg(
        F.expr(f"approx_percentile(o_totalprice, 0.5, {_APQ_ACC})").alias("apx")
    )
    return bands.join(sketch, "o_orderpriority").select(
        "o_orderpriority", "n", "exact_median", "band_lo", "band_hi",
        (
            (F.col("apx") >= F.col("band_lo")) & (F.col("apx") <= F.col("band_hi"))
        )
        .cast("long")
        .alias("sketch_within_band"),
    )


q_approx_quantile_band.__doc__ = q_approx_quantile_band.__doc__.format(acc=_APQ_ACC)
