"""Warehouse/product-analytics operators over the events stream:
ordered-funnel conversion, cohort retention, and continuous percentiles.

The reference's accumulated history (hourly snapshots keyed by report_ts,
sql_config.yaml:12-17) exists to serve exactly these longitudinal
questions; the operators generalize them to the canonical product shapes.

Exactness: counts are integers; every rate is ONE double division of exact
BIGINTs; the continuous-percentile interpolation selects its two bracketing
elements POSITIONALLY and applies one identically-shaped multiply-add on
both engines (frac = (pos_num % den) / den is an exact-integer-over-
power-of-ten division — correctly rounded the same everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table

_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "q_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_click,
           (SELECT COUNT(*) FROM s3) AS n_purchase,
           CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) AS click_rate,
           CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) AS purchase_rate
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase: a user counts
    at stage k only with an event AT OR AFTER their first stage-(k-1)
    event (the ordering constraint is what separates a funnel from three
    COUNT DISTINCTs).

    Three min-aggregates chained by equi-joins, all shuffling on user_id —
    one partitioning reused across every stage (co-partitioned joins, no
    re-shuffle between stages at scale). Stage tables only ever shrink, so
    later joins are broadcast-eligible and AQE converts them at runtime.
    Emits one row of exact counts + two single-division rates."""
    ev = load_table(spark, sf_dir, "events")

    def first_at_or_after(etype: str, prev: DataFrame | None) -> DataFrame:
        stage = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            stage = stage.join(prev, "user_id").filter(
                F.col("ts") >= F.col("prev_ts")
            )
        return stage.groupBy("user_id").agg(F.min("ts").alias("prev_ts"))

    s1 = first_at_or_after("signup", None)
    s2 = first_at_or_after("click", s1)
    s3 = first_at_or_after("purchase", s2)
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    return counts.select(
        "n_signup",
        "n_click",
        "n_purchase",
        (F.col("n_click").cast("double") / F.col("n_signup").cast("double")).alias(
            "click_rate"
        ),
        (
            F.col("n_purchase").cast("double")
            / F.col("n_signup").cast("double")
        ).alias("purchase_rate"),
    )


@register(
    "q_retention",
    oracle=f"""
    WITH wk AS (
      SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week_idx FROM events
    ),
    first_wk AS (
      SELECT user_id, MIN(week_idx) AS cohort FROM wk GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT f.cohort, wk.week_idx - f.cohort AS week_offset,
             wk.user_id
      FROM wk JOIN first_wk f ON wk.user_id = f.user_id
    ),
    cohort_size AS (
      SELECT cohort, COUNT(*) AS n_users FROM first_wk GROUP BY cohort
    )
    SELECT a.cohort, a.week_offset,
           COUNT(*) AS n_active,
           MAX(c.n_users) AS cohort_size,
           CAST(COUNT(*) AS DOUBLE) / CAST(MAX(c.n_users) AS DOUBLE)
             AS retention_rate
    FROM active a JOIN cohort_size c ON a.cohort = c.cohort
    GROUP BY a.cohort, a.week_offset
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the week of their first
    event (cohort), each later week recording what fraction of the cohort
    was active. Weeks are integer epoch-µs DIV week — no calendar/locale
    week-truncation semantics to disagree on between engines.

    Plan: one shuffle on user_id for the first-week aggregate, the
    activity join reuses it, then a hash aggregate on the (cohort, offset)
    cell grid — output is O(weeks²) regardless of user count. The cohort
    dim broadcasts. Rates are single divisions of exact counts."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) DIV {_WEEK_US}").alias("week_idx"),
    )
    first_wk = wk.groupBy("user_id").agg(F.min("week_idx").alias("cohort"))
    active = (
        wk.join(first_wk, "user_id")
        .select(
            "cohort",
            (F.col("week_idx") - F.col("cohort")).alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    cohort_size = first_wk.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return (
        active.join(F.broadcast(cohort_size), "cohort")
        .groupBy("cohort", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.max("n_users").alias("cohort_size"),
        )
        .select(
            "cohort",
            "week_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention_rate"),
        )
    )


# continuous percentiles: (quantile numerator, denominator) as exact ints
_PCTL = [(1, 2), (9, 10)]  # p50, p90


def _pctl_sql(num: int, den: int, alias: str) -> str:
    """One continuous percentile over the ranked CTE (see q_percentile_cont):
    pos = (n-1)·num/den, v = v_lo + (v_hi - v_lo)·frac with positional
    bracketing elements and frac an exact small-integer division."""
    return f"""
      MAX(CASE WHEN rn = ((n - 1) * {num}) // {den} + 1 THEN v END)
      + (MAX(CASE WHEN rn = ((n - 1) * {num}) // {den}
                       + CASE WHEN ((n - 1) * {num}) % {den} = 0
                              THEN 1 ELSE 2 END THEN v END)
         - MAX(CASE WHEN rn = ((n - 1) * {num}) // {den} + 1 THEN v END))
        * MAX(CAST(((n - 1) * {num}) % {den} AS DOUBLE) / {den}.0e0)
      AS {alias}"""


@register(
    "q_percentile_cont",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderpriority,
             o_totalprice AS v,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(n) AS n_orders,
           {_pctl_sql(1, 2, 'p50_price')},
           {_pctl_sql(9, 10, 'p90_price')}
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def q_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous (interpolated) percentiles per order priority — the
    PERCENTILE_CONT twin of q_percentile_disc. Engines' built-in
    percentile functions interpolate with engine-specific float paths, so
    this computes the textbook definition explicitly: pos = (n−1)·q as an
    exact integer fraction, bracketing values selected POSITIONALLY by
    rank, one multiply-add with the identical expression shape on both
    sides ⇒ bitwise-equal doubles.

    One ranked window pass per group + one hash aggregate; groups are
    priority-sized. (When the exact rank pass is too hot at scale, the
    approx path is q_group_approx's sketch family.)"""
    orders = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("v"),
        F.row_number()
        .over(wp.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def pctl(num: int, den: int, alias: str):
        lo_rn = F.expr(f"((n - 1) * {num}) DIV {den} + 1")
        rem = F.expr(f"((n - 1) * {num}) % {den}")
        hi_rn = lo_rn + F.when(rem == 0, 0).otherwise(1)
        v_lo = F.max(F.when(F.col("rn") == lo_rn, F.col("v")))
        v_hi = F.max(F.when(F.col("rn") == hi_rn, F.col("v")))
        frac = rem.cast("double") / F.lit(float(den))
        return (v_lo + (v_hi - v_lo) * F.max(frac)).alias(alias)

    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        pctl(1, 2, "p50_price"),
        pctl(9, 10, "p90_price"),
    )


@register(
    "q_scd2",
    oracle="""
    WITH src AS (
      SELECT user_id, ts, "value" FROM events WHERE event_type = 'signup'
    ),
    v AS (
      SELECT user_id, ts, "value",
             row_number() OVER w AS version_n,
             lead(ts) OVER w AS next_ts
      FROM src
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, "value")
    )
    SELECT user_id, version_n,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(next_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           (next_ts IS NULL) AS is_current,
           "value" AS attr_value
    FROM v
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each user's signup
    events become versioned rows with [valid_from, valid_to) intervals —
    valid_to is the NEXT version's start (lead over the user's timeline),
    NULL marks the current version. The temporal-table pattern every
    warehouse uses to answer "what was this attribute worth at time T"
    with a plain BETWEEN predicate.

    One shuffle on the dimension key; row_number and lead share the single
    window sort. In a deployment this feeds the keyed merge
    (plans/merge.py): new versions close the previous row's valid_to and
    insert themselves — the reference's nupdates counter
    (scrapper.py:197-199) is the degenerate one-column form of exactly
    this history. Interval bounds are emitted as zero-padded µs strings
    per the temporal-output policy."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("value").asc()
    )
    v = ev.select(
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("version_n"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return v.select(
        "user_id",
        "version_n",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "valid_to"
        ),
        F.col("next_ts").isNull().alias("is_current"),
        F.col("value").alias("attr_value"),
    )
