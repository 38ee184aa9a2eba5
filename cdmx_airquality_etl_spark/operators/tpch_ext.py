"""TPC-H-shaped decision-support batch A: the classic correlated-subquery
and disjunctive-predicate patterns (Q4, Q6, Q13, Q14, Q17, Q18, Q19 shapes)
adapted to the driver corpus columns (no partsupp / commitdate / shipmode in
the testdata, so each query substitutes an equivalent predicate over the
columns that exist — the *plan shape* being exercised is the point).

Lineage: the reference's analytical consumers run reporting SQL over the
loaded warehouse (SURVEY §2B query surface); these add the decorrelation
patterns (EXISTS → left-semi, correlated scalar agg → broadcast agg-join,
left-join zero-fill double aggregation) that a warehouse engine must plan
well.

Determinism policy (registry docstring): monetary sums go through
DECIMAL(18,2|4) before the double cast; the Q17 `0.2 * AVG(qty)` threshold
is rewritten as exact integer math (`5 * qty * cnt < sum_qty`, valid because
corpus quantities are integral) so the correlated comparison can never flip
on a last-ulp float difference between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table
from .relational import _dsum

_Q18_MIN_QTY = 300


# ---------------------------------------------------------------------------
# q_tpch_priority_exists — TPC-H Q4: order-priority checking via EXISTS
# ---------------------------------------------------------------------------
@register(
    "q_tpch_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 plan: the EXISTS decorrelates to a LEFT SEMI join on l_orderkey
    with the late-shipment predicate as the join condition (the extra
    non-equi conjunct rides the hash join, no nested loop). The quarter
    filter reaches the orders scan; the semi join deduplicates order keys
    before the tiny priority aggregate, so at 100 TB the shuffle carries
    only (orderkey, priority, orderdate) for one quarter of orders."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q_tpch_forecast_revenue — TPC-H Q6: what-if revenue from a discount band
# ---------------------------------------------------------------------------
@register(
    "q_tpch_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 plan: a pure scan-filter-aggregate — every predicate (shipdate
    band, discount band, quantity cap) is pushed into the parquet reader
    (PushedFilters), the projection prunes to three columns, and the global
    sum is a two-stage partial/final with a one-row exchange. This is the
    query shape that proves pushdown works: at 100 TB the scan cost IS the
    query cost, so row-group pruning on l_shipdate does all the work."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q_tpch_cust_distribution — TPC-H Q13: order-count distribution incl. zero
# ---------------------------------------------------------------------------
@register(
    "q_tpch_cust_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 plan: the non-key predicate lives in the LEFT JOIN's ON clause
    (filtering WHERE would silently drop zero-order customers — the whole
    point of the query), COUNT(o_orderkey) counts only matched rows so the
    never-ordered bucket survives as c_count = 0, and the second aggregate
    is over at most a few hundred distinct counts. At scale the first
    aggregate pre-shrinks per customer BEFORE the tiny distribution shuffle;
    Spark plans the left join + count as one shuffle on custkey."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, on=cond, how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q_tpch_promo_effect — TPC-H Q14: conditional-revenue share in one month
# ---------------------------------------------------------------------------
@register(
    "q_tpch_promo_effect",
    oracle="""
    SELECT CAST(100.0 AS DOUBLE)
           * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1.0 - l_discount)
                                ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 plan: part is the broadcast side (dimension), the one-month
    shipdate band is pushed to the lineitem scan, and both the conditional
    and total revenue accumulate in ONE aggregate pass through DECIMAL —
    the ratio is then a single double division, bit-identical across
    engines. No second scan, no join re-read."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * _dsum(promo, scale=4)
                / _dsum(disc, scale=4)
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q_tpch_small_qty — TPC-H Q17: correlated per-part average threshold
# ---------------------------------------------------------------------------
@register(
    "q_tpch_small_qty",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#3'
      AND 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
    """,
)
def q_tpch_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 plan: the correlated scalar subquery (`l_quantity <
    0.2 * AVG(qty) for this part`) decorrelates into a per-part aggregate
    joined back to the fact — Spark broadcasts the per-part (sum, cnt)
    table after the brand semi-cut shrinks it. The threshold compares in
    exact integers (quantities are integral in this corpus: 5*qty*cnt <
    sum) so no float-average ulp can flip a row between engines. At 100 TB
    the per-part agg is the map-side-combined shuffle; the fact is scanned
    once."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # brand cut first: the correlated aggregate only needs these parts
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).drop(
        "p_partkey"
    )
    part_avg = li_brand.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li_brand.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pk"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q_tpch_large_volume — TPC-H Q18: large-volume customers (HAVING on fact agg)
# ---------------------------------------------------------------------------
@register(
    "q_tpch_large_volume",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY}
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_tpch_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 plan: the IN-subquery (orders whose line quantities sum past the
    threshold) decorrelates to a left-semi join against the HAVING
    aggregate; the surviving keys are few, so the customer/orders joins run
    over a tiny filtered fact. Quantities aggregate as exact BIGINT. The
    final ORDER BY/LIMIT is a TakeOrderedAndProject. At 100 TB: one
    map-combined shuffle on l_orderkey for the HAVING agg, then joins over
    ~0.01% of orders."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_tpch_disjunctive — TPC-H Q19: OR-of-ANDs predicates across a join
# ---------------------------------------------------------------------------
@register(
    "q_tpch_disjunctive",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 plan: the classic disjunction-across-a-join. Catalyst factors the
    common join key out of the OR and derives single-side implied filters
    (brand IN (...) for part, quantity in the union band for lineitem) that
    DO push to each scan even though the full predicate spans both tables —
    the residual OR evaluates post-join. part broadcasts; one aggregate
    pass. This is the query that catches engines which give up on pushdown
    at the first OR."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & size.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & size.between(1, 15) & qty.between(20, 30))
    )
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(_dsum(disc, scale=4).alias("revenue"))
    )
