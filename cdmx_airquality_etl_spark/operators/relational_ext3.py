"""Third extension batch: argmax-by aggregation, ordered string aggregation,
error-safe (try_*) arithmetic, and date/interval arithmetic.

Lineage: argmax is the "latest report per station" identity the reference's
composite PK encodes (sql_config.yaml:18) done as a hash aggregate instead of
a window sort; try_* generalizes the reference's cast-with-failure-handling
(F-CAST, scrapper.py:63,114 — a failed int() aborts its run, here it yields
NULL per row); date arithmetic extends the exploded date-part dimension
(scrapper.py:154-165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table


@register(
    "q_argmax_group",
    oracle="""
    SELECT c_nationkey,
           max_by(c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                          * 10000000000 + c_custkey) AS richest_customer,
           MAX(c_acctbal) AS max_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_argmax_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per group via max_by — a single map-side-combinable hash
    aggregate, versus the window-rank formulation (q_window_rank) that must
    shuffle and sort every row. At 100 TB this is the difference between one
    partial-agg pass and a full-table sort. Ties are broken deterministically
    by packing (acctbal_cents, custkey) into one orderable BIGINT — valid
    while custkey < 1e10 and |acctbal| < 9e6 (int64 headroom); beyond that
    switch to a struct ordering key."""
    cust = load_table(spark, sf_dir, "customer")
    order_key = (
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
        * 10_000_000_000
        + F.col("c_custkey")
    )
    return cust.groupBy("c_nationkey").agg(
        F.max_by("c_name", order_key).alias("richest_customer"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "q_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys_csv,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderkey < 200
    GROUP BY o_orderpriority
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG WITHIN GROUP ↔ string_agg): the
    deterministic-order contract matters — an unordered listagg is
    nondeterministic under distributed partial aggregation and would never
    hash-match."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    orders.createOrReplaceTempView("__ord_la")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY o_orderkey) AS keys_csv,
               COUNT(*) AS n_orders
        FROM __ord_la
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity - 25 = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 25) END AS price_per_excess,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS line_roundtrip
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide/try_cast yield NULL instead of
    failing the job — per-row failure isolation, where the reference's bare
    int() (scrapper.py:63,114) aborts its whole run on one bad cell. At scale
    a single malformed row must never kill a 1000-executor job."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "price_per_excess"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").cast("int").alias("line_roundtrip"),
    )


@register(
    "q_window_distribution",
    oracle="""
    SELECT s_suppkey,
           percent_rank() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal, s_suppkey) AS pct_rank,
           cume_dist()    OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal, s_suppkey) AS cume
    FROM supplier
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank/cume_dist): where a row
    sits inside its partition's distribution — (rank−1)/(n−1) and
    rows≤current/n, both integer-ratio divisions, so IEEE-identical across
    engines."""
    from pyspark.sql.window import Window

    sup = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return sup.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           isodow(o_orderdate) - 1 AS weekday_mon0
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic beyond part extraction (q_date_parts):
    offsets, day differences, month truncation, month-end, ISO weekday —
    the derivations a report_ts-keyed history table serves daily."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return orders.select(
        "o_orderkey",
        # date outputs emitted as ISO strings (driver-canon hash safety; see
        # q_time_bucket) — the arithmetic itself stays native DATE ops
        F.date_add(F.to_date("o_orderdate"), 30).cast("string").alias("due_date"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_2025"),
        F.trunc(F.to_date("o_orderdate"), "month").cast("string").alias("order_month"),
        F.last_day(F.to_date("o_orderdate")).cast("string").alias("month_end"),
        F.weekday("o_orderdate").cast("long").alias("weekday_mon0"),
    )


@register(
    "q_corr_manual",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM v
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_qty_discount,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta_discount_per_qty
    FROM s
    """,
)
def q_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / regression slope per group with EXACT moment sums:
    built-in corr() accumulates floating-point state whose value depends on
    partial-aggregation order (non-reproducible across runs at scale, and
    never bitwise-equal across engines), so both variables are scaled to
    INTEGERS (×100 through a DECIMAL(18,2) cast — exact) and the moments
    (Σx, Σy, Σxy, Σx², Σy²) are summed as BIGINTs: associative, order-free,
    exact, and — because every sum here stays under 2^53 — exactly
    representable as doubles, so the closed-form corr/beta are deterministic
    functions of the data, identical in any engine. (The ×100 scaling
    cancels: corr is scale-invariant and both variables share the factor.)
    Deliberately NOT ``CAST(DECIMAL AS DOUBLE)`` on wide decimals: that cast
    is not correctly rounded in every engine (observed 1-ulp divergence on a
    DECIMAL(38,4) squared-price sum). Same map-side-combinable single-pass
    hash aggregate as corr()."""
    li = load_table(spark, sf_dir, "lineitem")
    x = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    y = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    s = li.select("l_returnflag", x.alias("x"), y.alias("y")).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_discount"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("beta_discount_per_qty"),
    )
