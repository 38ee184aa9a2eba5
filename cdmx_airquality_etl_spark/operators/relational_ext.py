"""Extended relational surface: the remaining query shapes a user of a
general-purpose engine reaches for — cube/grouping-sets totals, tiling and
RANGE-frame windows, lateral array expansion, ordered list aggregation.

Each generalizes the reference's denormalized date-dimension reporting model
(sql_config.yaml:12-17) the same way q_rollup_cube does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^n grouping combinations in one
    Expand + hash-agg pass — the full cross-tab of the reference's
    denormalized report dims (sql_config.yaml:12-17)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority").agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (each flag alone + grand total): the
    hand-picked subset of CUBE a report actually needs — same single-pass
    Expand plan, fewer emitted groups."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               COUNT(*) AS n_rows
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS balance_quartile,
           rank()   OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS balance_rank,
           dense_rank() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
    FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartiles/ranks. NOTE (scale): an unpartitioned window funnels
    the table through one task — acceptable for dimension-sized inputs like
    customer, by design. For fact-scale global bucketing use the
    boundary-broadcast form (q_quantile_bucket); for fact-scale global
    ranking, range partitioning + per-partition rank + offset merge."""
    customer = load_table(spark, sf_dir, "customer")
    w_global = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    w_nation = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w_global).alias("balance_quartile"),
        F.rank().over(w_global).alias("balance_rank"),
        F.dense_rank().over(w_nation).alias("rank_in_nation"),
    )


@register(
    "q_quantile_bucket",
    oracle="""
    WITH b AS (
      SELECT quantile_disc(c_acctbal, 0.25) AS p25,
             quantile_disc(c_acctbal, 0.50) AS p50,
             quantile_disc(c_acctbal, 0.75) AS p75
      FROM customer
    )
    SELECT c_custkey,
           1 + CAST(c_acctbal > b.p25 AS INT) + CAST(c_acctbal > b.p50 AS INT)
             + CAST(c_acctbal > b.p75 AS INT) AS balance_quartile
    FROM customer, b
    """,
)
def q_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-scale form of q_window_ntile's global quartiles: compute the
    three boundary values as ONE tiny aggregate, broadcast the 1-row result
    back, and bucket by plain comparisons — no global sort, no single-task
    window; the scan side stays embarrassingly parallel. Boundaries here are
    exact percentile_disc (a data member, no interpolation → bitwise oracle
    agreement); at 100 TB swap in approx_percentile — a mergeable sketch with
    bounded rank error — and the plan shape is unchanged. Bucket semantics:
    count of boundaries strictly below the value (ties share a bucket), which
    is ntile minus its even-cardinality tie-splitting."""
    customer = load_table(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("__cust_qb")
    bounds = spark.sql(
        """
        SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY c_acctbal) AS p50,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal) AS p75
        FROM __cust_qb
        """
    )
    quartile = (
        F.lit(1)
        + (F.col("c_acctbal") > F.col("p25")).cast("int")
        + (F.col("c_acctbal") > F.col("p50")).cast("int")
        + (F.col("c_acctbal") > F.col("p75")).cast("int")
    )
    return customer.join(F.broadcast(bounds)).select(
        "c_custkey", quartile.alias("balance_quartile")
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id, value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_events_last_hour
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per event, how many of the user's events
    fall in the trailing hour — the sliding-window count ST-COUNT computes in
    streaming, as a batch analytic."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_events_last_hour"),
    )


@register(
    "q_explode_tokens",
    oracle=r"""
    SELECT doc_id, u.tok, CAST(u.pos AS INTEGER) AS pos
    FROM (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents WHERE doc_id < 50
    ), LATERAL (
      SELECT unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS pos
    ) u
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array expansion with ordinality (posexplode ↔ unnest WITH
    ORDINALITY) — the S-TBL rows→records shape as a first-class operator."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    return docs.select("doc_id", F.posexplode(toks).alias("pos", "tok")).select(
        "doc_id", "tok", F.col("pos").cast("int").alias("pos")
    )


@register(
    "q_collect_sorted",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect_set is unordered by contract,
    so sort_array makes the result comparable — the only safe way to emit
    array aggregates from a distributed engine. The sorted set is emitted as
    a ','-joined string so the result is hashable under pandas-based result
    canonicalization (array cells are unhashable lists there)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
