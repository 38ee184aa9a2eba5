"""TPC-H-shaped decision-support batch B: the multi-dimension-role and
nested-aggregate patterns (Q2, Q7, Q9, Q10, Q11, Q15, Q21, Q22 shapes)
adapted to the driver corpus (no partsupp table — the part↔supplier
relation derives from observed lineitem shipments; no phone country codes —
market segment stands in as the Q22 grouping dimension).

Lineage: continues the warehouse surface of operators/warehouse.py
(Q3/Q5/Q8) and operators/tpch_ext.py (Q4..Q19); together the repo now covers
every TPC-H plan family expressible over the corpus columns.

Determinism policy: monetary aggregates sum through DECIMAL; equality
comparisons against aggregated thresholds (Q15 max-revenue, Q11 value
fraction) stay in DECIMAL on BOTH engines so no double rounding can flip a
boundary row; the Q22 average-balance threshold is one double division of
exact terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table
from .relational import _dsum


# ---------------------------------------------------------------------------
# q_tpch_min_cost_supplier — TPC-H Q2: per-part minimum over a derived
# part↔supplier relation
# ---------------------------------------------------------------------------
@register(
    "q_tpch_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    m AS (
      SELECT l_partkey AS pk, MIN(s_acctbal) AS min_bal
      FROM ps JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY l_partkey
    )
    SELECT p_partkey, s_suppkey, s_name,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name
    FROM ps
    JOIN part     ON p_partkey = l_partkey AND p_type = 'LARGE'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN m        ON pk = l_partkey AND s_acctbal = min_bal
    ORDER BY s_acctbal DESC, p_partkey, s_suppkey
    LIMIT 20
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 plan: the correlated `MIN(cost) for this part` subquery
    decorrelates into a per-part aggregate over the DISTINCT observed
    (part, supplier) shipment pairs, joined back on (partkey, acctbal =
    min). The distinct pre-shrinks the fact to its key domain BEFORE any
    dimension join; supplier and nation broadcast; equality against the min
    compares raw stored doubles (no arithmetic), so it is exact. Ties on
    the min keep all suppliers, as in the reference query; the ORDER
    BY/LIMIT is total (acctbal, partkey, suppkey) so top-20 is stable."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "LARGE")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ps_bal = ps.join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
    mins = ps_bal.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        ps_bal.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(
            F.broadcast(mins),
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "n_name",
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_tpch_cross_border — TPC-H Q7: international volume, nation-pair × year
# ---------------------------------------------------------------------------
@register(
    "q_tpch_cross_border",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    WHERE s_nationkey <> c_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ns.n_name, EXTRACT(year FROM l_shipdate)
    """,
)
def q_tpch_cross_border(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 plan: the nation dimension plays TWO roles (supplier side,
    customer side); the cross-border predicate (s_nationkey <> c_nationkey)
    evaluates on the joined keys *before* the name lookup, so only one
    broadcast of nation is needed for the output name. Orders/customer resolve the customer nation as a key-join (both are
    fact-scale — no broadcast hint; AQE picks the strategy from measured
    sizes); the supplier broadcast resolves the seller nation; the
    two-year band pushes to the lineitem scan. Output is at
    most |nation| × 2 rows — the aggregate is map-side combined."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(_dsum(disc, scale=4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q_tpch_product_profit — TPC-H Q9: profit by supplier nation × order year
# ---------------------------------------------------------------------------
@register(
    "q_tpch_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         - l_quantity * p_retailprice * CAST(0.2 AS DOUBLE)
                    AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 plan: profit = revenue − carrying cost (0.2 × retail price stands
    in for ps_supplycost, which this corpus lacks). The p_name LIKE filter
    semi-cuts the part dimension before broadcast; per-row profit is pure
    double IEEE arithmetic (deterministic), then sums through DECIMAL. One
    fact scan, three broadcast dimensions, one shuffle for the
    (nation, year) aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.2)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit, scale=4).alias("profit"))
    )


# ---------------------------------------------------------------------------
# q_tpch_returned_items — TPC-H Q10: top customers by returned-item revenue
# ---------------------------------------------------------------------------
@register(
    "q_tpch_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 plan: returned-line revenue per customer in one quarter. The
    returnflag filter pushes to the lineitem scan and the quarter band to
    orders; the nation dimension broadcasts while the orders/customer
    joins stay un-hinted (quarter-filtered orders is still fact-scale at
    100 TB — AQE broadcasts it only when measured small); the aggregate groups on the
    customer grain and the top-20 is a TakeOrderedAndProject with a total
    tiebreak (revenue desc, custkey)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(disc, scale=4).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_tpch_important_stock — TPC-H Q11: value fraction with a scalar threshold
# ---------------------------------------------------------------------------
@register(
    "q_tpch_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE v > (SELECT SUM(v) * 0.001 FROM val)
    """,
)
def q_tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 plan: per-part shipped value restricted to suppliers of a nation
    group, kept only where the part's value exceeds 0.1% of the group
    total. The scalar-threshold subquery becomes a one-row broadcast cross
    join (never a collect); BOTH the per-part values and the threshold stay
    in DECIMAL through the comparison — 0.001 × DECIMAL is exact in both
    engines — so no boundary part can flip on double rounding. The val
    aggregate is computed once and reused for the total (Spark plans the
    reuse as a shuffle-stage reuse under AQE)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("v"))
    )
    total = val.agg((F.sum("v") * F.lit(0.001).cast("decimal(4,3)")).alias("thr"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# q_tpch_top_supplier — TPC-H Q15: supplier(s) achieving the max revenue
# ---------------------------------------------------------------------------
@register(
    "q_tpch_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE r = (SELECT MAX(r) FROM rev)
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 plan: quarter revenue per supplier, then keep the one(s) equal
    to the maximum — the classic aggregate-of-aggregate. The max arrives as
    a one-row broadcast; revenue stays DECIMAL through the equality (an
    exact compare — the whole reason Q15 is a correctness trap for
    float-summing engines). Ties return every top supplier, per the
    reference query's ties semantics."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(
        F.sum(disc.cast("decimal(18,4)")).alias("r")
    )
    mx = rev.agg(F.max("r").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# q_tpch_waiting_supplier — TPC-H Q21: sole-late-supplier in multi-supplier
# orders
# ---------------------------------------------------------------------------
@register(
    "q_tpch_waiting_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                                 THEN l_suppkey END) AS n_late,
             MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_tpch_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 plan: "suppliers who alone delayed a multi-supplier order". The
    reference phrasing uses EXISTS + NOT EXISTS self-joins on lineitem;
    here it reformulates as ONE aggregate per order — distinct suppliers,
    distinct late suppliers, and (when unique) the late supplier's key —
    which is the scale-correct plan: a single shuffle on l_orderkey instead
    of two extra fact self-joins (the status-filtered orders side joins
    un-hinted — it is fact-scale). late = shipped >90 days after the order
    date (this corpus has no commit/receipt dates). Output: top-10
    suppliers by blocked-order count."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    late_supp = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.min(late_supp).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(supp), per_order.late_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_tpch_lapsed_customers — TPC-H Q22: high-balance customers gone quiet
# ---------------------------------------------------------------------------
@register(
    "q_tpch_lapsed_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    """,
)
def q_tpch_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 plan: customers whose balance beats the positive-balance average
    but placed no order since 2000 (market segment stands in for the phone
    country code). The average threshold is computed as exact-decimal sum ÷
    count — ONE double division, identical in both engines — and arrives
    as a one-row broadcast; the NOT EXISTS decorrelates to a left-anti join
    against the date-filtered orders (the filter pushes to the orders scan
    first, shrinking the anti side). Group totals sum through DECIMAL."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
