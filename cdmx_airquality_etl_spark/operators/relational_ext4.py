"""Fourth extension batch: semantic-corner operators — NULL-safe join
equality, forward fill (last observation carried forward), and dense-grid
reporting with zero-fill.

These are the corners where engines silently disagree: NULL keys vanish from
ordinary equi-joins, window last_value needs IGNORE NULLS for gap repair, and
reports over sparse data need the empty cells materialized. Each is pinned to
the DuckDB oracle precisely because the semantics are easy to get wrong.
Lineage: the reference stores NULLs for missing divs (V-NULL,
/root/reference/scrapper.py:56-75) and its hourly snapshots imply gap repair
and dense hourly grids downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table


@register(
    "q_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE o_orderkey % 13 END AS k
      FROM orders WHERE o_orderkey < 4000
    ),
    b AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 13 END AS k
      FROM orders WHERE o_orderkey >= 4000 AND o_orderkey < 8000
    )
    SELECT a.k AS key, COUNT(*) AS n_matches
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (<=> / IS NOT DISTINCT FROM): ordinary equi-joins
    silently drop NULL keys; merge semantics over nullable natural keys need
    NULL = NULL to match. Spark plans <=> as a regular hash join (NULL hashes
    like any value under null-safe equality), so the scale profile is
    unchanged — no fallback to nested-loop."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.when(F.col("o_orderkey") % 11 == 0, None).otherwise(
        F.col("o_orderkey") % 13
    )
    key_b = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
        F.col("o_orderkey") % 13
    )
    a = orders.filter(F.col("o_orderkey") < 4000).select(key.alias("k"))
    b = orders.filter(
        (F.col("o_orderkey") >= 4000) & (F.col("o_orderkey") < 8000)
    ).select(key_b.alias("kb"))
    return (
        a.join(b, a["k"].eqNullSafe(b["kb"]))
        .groupBy(F.col("k").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


@register(
    "q_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      FROM events WHERE user_id < 50
    )
    """,
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / LOCF: repair gaps by carrying the last non-NULL
    observation forward within each key's timeline — the standard repair for
    missed snapshots (the reference's failed hourly scrapes). One window
    pass, partitioned by key: shuffles once on user_id and scales linearly."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    v = F.when(F.col("event_type") == "click", None).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ts emitted as a zero-padded µs ISO string — raw timestamp outputs
    # canonicalize to datetime64[ns] (Spark) vs datetime64[us] (DuckDB)
    # under the pandas bridge, the dtype-sensitivity q_time_bucket documents
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "q_gaps_islands",
    oracle="""
    WITH hours AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS h
      FROM events WHERE user_id < 40
    ),
    grp AS (
      SELECT user_id, h,
             h - row_number() OVER (PARTITION BY user_id ORDER BY h) AS island
      FROM hours
    )
    SELECT user_id, MIN(h) AS start_hour, MAX(h) AS end_hour,
           COUNT(*) AS n_hours
    FROM grp GROUP BY user_id, island
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's active hours into maximal
    consecutive runs (value − row_number is constant within a run). The
    continuity question an hourly snapshot history answers ("which coverage
    periods are unbroken, where did the scraper miss hours") — one window
    pass + one aggregate, both partitioned by user."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    hours = events.select(
        "user_id",
        # floor, not cast: cast truncates toward zero, which disagrees with
        # date_diff for pre-anchor timestamps and fuses the two half-hours
        # around the anchor
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(F.lit("2024-01-01").cast("timestamp")))
            / F.lit(3_600_000_000)
        ).cast("long").alias("h"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("h")
    grp = hours.withColumn("island", F.col("h") - F.row_number().over(w))
    return grp.groupBy("user_id", "island").agg(
        F.min("h").alias("start_hour"),
        F.max("h").alias("end_hour"),
        F.count(F.lit(1)).alias("n_hours"),
    ).drop("island")


@register(
    "q_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           max_by(o_orderpriority,
                  n * 10 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) AS modal_priority,
           MAX(n) AS modal_count
    FROM c GROUP BY o_orderstatus
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: two stacked hash aggregates (count,
    then argmax of count) with ties broken by the priority's leading ordinal
    — engines disagree on bare mode() tie-breaks, so the packing makes the
    answer well-defined everywhere."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    pack = F.col("n") * 10 - F.substring("o_orderpriority", 1, 1).cast("long")
    return counts.groupBy("o_orderstatus").agg(
        F.max_by("o_orderpriority", pack).alias("modal_priority"),
        F.max("n").alias("modal_count"),
    )


@register(
    "q_dense_grid",
    oracle="""
    WITH counts AS (
      SELECT c.c_nationkey AS nk, o.o_orderstatus AS st, COUNT(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT n.n_nationkey AS nationkey, s.st AS orderstatus,
           COALESCE(counts.n, 0) AS n_orders
    FROM nation n
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) s
    LEFT JOIN counts ON counts.nk = n.n_nationkey AND counts.st = s.st
    """,
)
def q_dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid report: every (nation × status) cell materialized, zeros
    included — sparse aggregates leave reporting holes. The grid is a cross
    join of two *small distinct* sets (never of facts); the fact-side count
    is aggregated before the left join, so the expensive table is touched
    once."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    counts = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"), F.col("o_orderstatus").alias("st")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    statuses = orders.select(
        F.col("o_orderstatus").alias("st_g")
    ).distinct()
    grid = nation.select(F.col("n_nationkey").alias("nationkey")).crossJoin(
        statuses
    )
    return (
        grid.join(
            counts,
            (grid.nationkey == counts.nk) & (grid.st_g == counts.st),
            "left",
        )
        .select(
            "nationkey",
            F.col("st_g").alias("orderstatus"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# q_lateral_join — correlated LATERAL subquery (per-row dependent subquery)
# ---------------------------------------------------------------------------
_LATERAL_K = 2


@register(
    "q_lateral_join",
    oracle=f"""
    SELECT c.c_custkey, c.c_mktsegment,
           l.o_orderkey,
           strftime(l.o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS o_orderdate,
           l.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      ORDER BY o_orderdate DESC, o_orderkey ASC
      LIMIT {_LATERAL_K}
    ) l ON true
    WHERE c.c_custkey < 300
    """,
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (Spark 4 ``DataFrame.lateralJoin`` +
    ``Column.outer()``): for each customer, its 2 most recent finished
    orders — the per-row dependent subquery shape (top-k per outer row)
    that SQL expresses as JOIN LATERAL and the DataFrame API could not
    express at all before Spark 4.

    Catalyst decorrelates the lateral subquery into a window-over-join
    (DecorrelateInnerQuery): the physical plan is the same shuffle +
    per-key ranking q_topk_per_group builds by hand — NOT a per-outer-row
    re-execution — so the lateral form costs one shuffle of the filtered
    orders at any scale. Deterministic: ties broken by o_orderkey; the
    orderstatus filter is pushed into the orders scan before the shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust = customer.filter(F.col("c_custkey") < 300)
    recent = (
        orders.where(
            (F.col("o_custkey") == F.col("c_custkey").outer())
            & (F.col("o_orderstatus") == "F")
        )
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(_LATERAL_K)
    )
    # o_orderdate emitted as a zero-padded µs ISO string (see q_forward_fill)
    return cust.lateralJoin(recent).select(
        "c_custkey",
        "c_mktsegment",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "o_orderdate"
        ),
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# q_recursive_cte — WITH RECURSIVE date spine (Spark 4 recursive CTE)
# ---------------------------------------------------------------------------
@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE days(d, dmax) AS (
      SELECT CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE) FROM events
      UNION ALL
      SELECT d + INTERVAL 1 DAY, dmax FROM days WHERE d < dmax
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
    )
    SELECT CAST(days.d AS VARCHAR) AS day,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
    FROM days LEFT JOIN daily ON days.d = daily.d
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): build the dense calendar
    spine between the corpus's first and last event day, zero-filling days
    with no events — the reporting pattern q_dense_grid solves with a cross
    join, expressed through the new recursion surface instead. The anchor
    carries (min_day, max_day) so the recursive step needs no subquery;
    depth = calendar span in days, each step a constant-size row — the
    corpus itself is aggregated ONCE and joined to the spine, so recursion
    cost is independent of data volume. Day emitted as an ISO string per
    the temporal-output policy.

    Depth bound: Spark enforces spark.sql.cteRecursionLevelLimit on the
    spine (one level per day), where DuckDB does not — the session factory
    raises the limit to 1M levels (session.py) so any realistic calendar
    span fits; a corpus wider than that should step the spine in chunks."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_rcte")
    return spark.sql(
        """
        WITH RECURSIVE days(d, dmax) AS (
          SELECT CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE) FROM events_rcte
          UNION ALL
          SELECT date_add(d, 1), dmax FROM days WHERE d < dmax
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
          FROM events_rcte GROUP BY CAST(ts AS DATE)
        )
        SELECT CAST(days.d AS STRING) AS day,
               CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
        FROM days LEFT JOIN daily ON days.d = daily.d
        """
    )


# ---------------------------------------------------------------------------
# q_variant_extract — Spark 4 VARIANT path for semi-structured fields
# ---------------------------------------------------------------------------
@register(
    "q_variant_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           COUNT(*) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id
    FROM events
    GROUP BY 1
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed path
    access with ``variant_get`` — the scale path for heterogeneous JSON
    (variant decodes the document once and supports columnar shredding,
    where per-path ``get_json_object`` re-parses the string per extraction;
    q_json_extract keeps the classic path for comparison). The oracle is
    the PLAIN JSON extraction — value equality proves the variant path
    computes the same answer, the same oracle-as-equivalence-proof pattern
    as q_group_salted."""
    events = load_table(spark, sf_dir, "events")
    k_int = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select(k_int.alias("k_int"), "event_id")
        .groupBy("k_int")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# q_set_ops_all — bag semantics: INTERSECT ALL / EXCEPT ALL multiplicities
# ---------------------------------------------------------------------------
@register(
    "q_set_ops_all",
    oracle="""
    SELECT 'both_all' AS side, nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    UNION ALL
    SELECT 'customer_only_all' AS side, nationkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — the multiplicity twin of
    q_intersect_except's DISTINCT forms and another silent-divergence
    corner: INTERSECT ALL keeps min(m_left, m_right) copies per value and
    EXCEPT ALL keeps m_left − m_right (a ported report that swaps
    ALL/DISTINCT changes row counts without erroring). Spark's
    intersectAll/exceptAll compile to the same count-min/count-diff
    aggregate shape the SQL standard prescribes — one hash aggregate per
    side keyed on the value, no sort, scale-safe like any groupBy. The
    surviving multiplicities re-aggregate to (side, value, n) so the
    check pins the COUNTS, not just membership."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    rich = customer.filter(F.col("c_acctbal") > 9000.0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = supplier.select(F.col("s_nationkey").alias("nationkey"))
    both = (
        rich.intersectAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("both_all").alias("side"), "nationkey", "n")
    )
    only = (
        rich.exceptAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("customer_only_all").alias("side"), "nationkey", "n")
    )
    return both.unionByName(only)
