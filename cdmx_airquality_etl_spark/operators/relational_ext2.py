"""Second extension batch: ordered-set aggregates, SQL subqueries, top-k per
group, unpivot/melt, non-equi (range) joins, time-bucket rollups, and the
string/array scalar-function surface.

These complete the query surface a user of the reference's star-ish schema
(SURVEY.md §2 Part B) would reach for: the reference's denormalized date
dimension (sql_config.yaml:12-17) implies time-bucket reporting, its
``calidad_del_aire`` ordinal implies banding (range join), and its
normalize/split text pipeline (scrapper.py:20-26,41) implies the full
string/array function library.

Hash-stability: double sums go through DECIMAL (exact, order-independent);
decimal rounding of doubles is never exactly-halfway (a binary double cannot
land on a decimal .5 boundary), so Spark and DuckDB round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table


@register(
    "q_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.50) AS p50_qty,
           quantile_disc(l_quantity, 0.90) AS p90_qty,
           quantile_disc(l_extendedprice, 0.99) AS p99_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (ordered-set aggregate). percentile_disc returns a
    member of the data set — no interpolation arithmetic — so Spark and DuckDB
    agree bitwise. At scale this is a single hash-agg pass with per-group
    sorted state; for fact-scale cardinalities prefer approx_percentile
    (see q_group_approx)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_pct")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
               percentile_disc(0.90) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM __li_pct
        GROUP BY l_returnflag
        """
    )


_EXISTS_SQL = """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


@register("q_exists_subquery", oracle=_EXISTS_SQL)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the SQL face of semi/anti joins
    (M-UPSERT's matched/not-matched split, scrapper.py:197-206). Catalyst
    rewrites both subqueries to LeftSemi/LeftAnti hash joins, so the physical
    plan is identical to q_join_semi/q_join_anti — no per-row subquery."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_SQL)


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders) * 2
          > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
"""


@register("q_scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries: orders priced above 1.5× the mean.
    Written as price*COUNT*2 > 3*SUM in exact DECIMAL so the threshold compare
    is bitwise-stable (AVG would force double division in DuckDB). Catalyst
    executes the scalar subqueries once and broadcasts the constants."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_SQL)


@register(
    "q_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (k=3 priciest orders per priority). At scale Catalyst
    pushes the rank filter into the window sort as a group-limit
    (WindowGroupLimit), so each partition keeps only k rows before shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (value FOR measure IN (l_quantity, l_discount, l_tax))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (UNPIVOT): the inverse of q_pivot. Maps each source row
    to 3 (measure, value) rows without a shuffle — a narrow transform."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "q_range_join",
    oracle="""
    SELECT b.band, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders o
    JOIN (VALUES ('low', 0.0, 50000.0),
                 ('mid', 50000.0, 150000.0),
                 ('high', 150000.0, 1e12)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/banding) join: facts against interval bounds — the
    ordinal banding implied by the reference's calidad_del_aire scale
    (sql_config.yaml:9). The band table is tiny → Spark broadcasts it and the
    join is a BroadcastNestedLoopJoin: each fact partition scans 3 bands
    locally, no shuffle. At 100 TB this stays a map-side operation."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e12)],
        "band string, lo double, hi double",
    )
    joined = orders.join(
        F.broadcast(bands),
        (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


@register(
    "q_time_bucket",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS bucket_day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: events into (day, type) cells —
    the batch form of ST-COUNT's windowed aggregation and the reporting query
    the reference's exploded date parts exist for (scrapper.py:154-165).
    The bucket expr is scalar, so this is one hash-agg shuffle; at scale the
    bucket column doubles as the partition key for the sink table."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            # emitted as an ISO string: Spark DATE→pandas object-of-date vs
            # DuckDB DATE→datetime64 hash differently under the driver canon
            F.to_date("ts").cast("string").alias("bucket_day"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "q_conditional_agg",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (l_returnflag = 'R') AS n_returned,
           COUNT(*) FILTER (l_quantity > 25)    AS n_bulk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_discount > 0.05) AS DOUBLE) AS discounted_price,
           CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if / CASE-sum): many
    measures over one scan instead of N filtered scans — at 100 TB the
    difference between reading the fact table once and N times."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.sum(
            F.when(
                F.col("l_discount") > 0.05,
                F.col("l_extendedprice").cast("decimal(18,2)"),
            )
        ).cast("double").alias("discounted_price"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_taxfree"),
    )


@register(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS last_price,
           nth_value(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with explicit frames: last_value needs the
    full-partition frame (the default frame ends at CURRENT ROW — the classic
    silent-wrong-answer both engines share, pinned here by the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
    )


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           length(p_name) AS name_len,
           left(p_type, 5) AS type5,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           repeat('*', p_size % 5) AS stars,
           translate(p_name, 'aeiou', 'AEIOU') AS name_caps_vowels,
           levenshtein(p_brand, 'Brand#00') AS brand_dist,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar string-function surface beyond q_normalize_text: pad /
    reverse / repeat / translate / edit-distance / multi-concat — the library
    F-NORM/F-REPL (scrapper.py:20-26,38) draws from. All JVM built-ins inside
    one WholeStageCodegen projection; zero Python."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_caps_vowels"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("long").alias("brand_dist"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q_array_funcs",
    oracle=r"""
    SELECT doc_id,
           len(toks) AS n_toks,
           len(list_distinct(toks)) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
           list_contains(toks, 'the') AS has_the
    FROM (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE doc_id < 100
    )
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over tokenized text (F-SPLIT generalized,
    scrapper.py:41): size / distinct / sort / slice / membership, all native
    higher-order array exprs — the building blocks the dedup shingling ops
    compose. Distinct output is sorted before slicing because set order is
    engine-specific."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)).alias(
            "first3_sorted"
        ),
        F.array_contains(toks, "the").alias("has_the"),
    )
