"""TPC-H decision-support batch C: the last three plan shapes (Q12, Q16,
Q20) — with batches A (tpch_ext.py) and B (tpch_ext2.py) and the warehouse
batch (Q3/Q5/Q8), every TPC-H query family now has an oracle-checked
equivalent over the corpus columns. Columns the corpus lacks substitute a
derived equivalent that preserves the PLAN SHAPE: l_shipmode → line-parity
class (Q12's conditional-sum-over-join doesn't care what the class means),
ps_availqty → the supplier's own shipped-quantity ratio (Q20's nested
per-supplier aggregate comparison survives intact).

Determinism: counts and quantities are exact BIGINTs; the Q20 ratio
comparison cross-multiplies in integers (6·part_qty > total_qty) so no
division precedes a filter."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table


# ---------------------------------------------------------------------------
# q_tpch_shipmode_priority — TPC-H Q12: conditional priority counts per class
# ---------------------------------------------------------------------------
@register(
    "q_tpch_shipmode_priority",
    oracle="""
    SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
)
def q_tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 plan: late shipments classified by ship class (line parity
    stands in for ship mode — the corpus has none), counting high- vs
    low-priority orders per class in ONE conditional-sum pass over the
    join. The year band pushes to the lineitem scan; the lateness
    predicate (ship > order + 30d) rides the join; orders joins un-hinted
    (fact-scale — AQE picks the strategy).
    Q12's point is that both counters come from one aggregate, not two
    filtered scans."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(
            F.when(F.col("l_linenumber") % 2 == 0, "EVEN").otherwise("ODD").alias("ship_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q_tpch_parts_supplier_count — TPC-H Q16: distinct suppliers per part class
# ---------------------------------------------------------------------------
@register(
    "q_tpch_parts_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_type,
           CAST(p_size // 10 AS BIGINT) AS size_band,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
           CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS part_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY p_type, p_size // 10
    """,
)
def q_tpch_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 plan: how many distinct suppliers can serve each (type,
    size-band) part class, excluding one brand — the sourcing-risk
    rollup. The part↔supplier relation derives from observed shipments
    (DISTINCT pre-shrink, as Q2), the brand exclusion semi-cuts the
    dimension before broadcast, and both distinct counts share one hash
    aggregate. Q16's trap is double-counting suppliers across parts —
    COUNT(DISTINCT) per class is the contract."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select("p_partkey", "p_type", "p_size")
    )
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy(
            "p_type",
            F.floor(F.col("p_size") / 10).cast("bigint").alias("size_band"),
        )
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.countDistinct("p_partkey").alias("part_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# q_tpch_concentrated_suppliers — TPC-H Q20: nested per-supplier ratio gate
# ---------------------------------------------------------------------------
@register(
    "q_tpch_concentrated_suppliers",
    oracle="""
    WITH yr AS (
      SELECT l_suppkey, l_partkey, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ),
    widget AS (
      SELECT l_suppkey, SUM(q) AS widget_qty
      FROM yr JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%widget%'
      GROUP BY l_suppkey
    ),
    total AS (
      SELECT l_suppkey, SUM(q) AS total_qty FROM yr GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(widget_qty AS BIGINT) AS widget_qty,
           CAST(total_qty AS BIGINT) AS total_qty
    FROM widget
    JOIN total USING (l_suppkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE 6 * widget_qty > total_qty
    """,
)
def q_tpch_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 plan: suppliers whose 1996 widget shipments exceed a sixth of
    their total 1996 shipments (the corpus spreads quantity over ~6 part
    nouns, so a sixth is the over-indexing threshold) — the nested aggregate-vs-aggregate gate (the
    original compares stock to half of shipped quantity; the corpus has
    no availqty, so the ratio compares two shipment aggregates — same
    shape: two groupings of the same filtered fact joined per supplier).
    The ratio gate cross-multiplies in exact integers (6·widget > total),
    never dividing before the filter. One fact scan feeds both
    aggregates; the year band pushes down; part and supplier broadcast."""
    yr = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", F.col("l_quantity").cast("bigint").alias("q"))
    )
    widget_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    widget = (
        yr.join(F.broadcast(widget_parts), yr.l_partkey == widget_parts.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("q").alias("widget_qty"))
    )
    total = yr.groupBy(F.col("l_suppkey").alias("tk")).agg(
        F.sum("q").alias("total_qty")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        widget.join(F.broadcast(total), widget.l_suppkey == total.tk)
        .filter(6 * F.col("widget_qty") > F.col("total_qty"))
        .join(F.broadcast(supp), widget.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "widget_qty", "total_qty")
    )
