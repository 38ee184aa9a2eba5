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


# ---------------------------------------------------------------------------
# q_event_transitions — first-order Markov transition matrix over event types
# ---------------------------------------------------------------------------
@register(
    "q_event_transitions",
    oracle="""
    SELECT from_type, to_type,
           CAST(cnt AS BIGINT) AS n_transitions,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS p_transition
    FROM (
      SELECT from_type, to_type, cnt,
             SUM(cnt) OVER (PARTITION BY from_type) AS total
      FROM (
        SELECT from_type, to_type, COUNT(*) AS cnt
        FROM (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS to_type
          FROM events
        )
        WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
      )
    )
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: per user,
    events ordered by (ts, event_id) — event_id breaks timestamp ties so
    the sequence is total-ordered and engine-independent — then counted by
    (state, next-state) and normalized within each from-state.

    Plan: ONE shuffle on user_id serves the LEAD window; the 5x5 matrix
    aggregate and the row-normalizing window run on the tiny grouped
    result. p is a ratio of two BIGINTs through IEEE division — correctly
    rounded, so bit-identical in both engines. At 100 TB the sequence sort
    is the cost; it rides the same user_id partitioning every other
    per-user operator (sessionize, funnel, retention) reuses."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("cnt").cast("long").alias("n_transitions"),
        (
            F.col("cnt").cast("double") / F.sum("cnt").over(wt).cast("double")
        ).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# q_ab_welch — Welch's t-test between two deterministic cohorts
# ---------------------------------------------------------------------------
@register(
    "q_ab_welch",
    oracle="""
    WITH x AS (
      SELECT o_custkey % 2 AS cohort,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ), m AS (
      SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
             CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
             CAST(CAST(SUM(CASE WHEN cohort = 0 THEN usd ELSE 0 END) AS BIGINT) AS DOUBLE) AS sa,
             CAST(CAST(SUM(CASE WHEN cohort = 1 THEN usd ELSE 0 END) AS BIGINT) AS DOUBLE) AS sb,
             CAST(CAST(SUM(CASE WHEN cohort = 0 THEN usd * usd ELSE 0 END) AS BIGINT) AS DOUBLE) AS qa,
             CAST(CAST(SUM(CASE WHEN cohort = 1 THEN usd * usd ELSE 0 END) AS BIGINT) AS DOUBLE) AS qb
      FROM x
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           sa / na AS mean_a_usd,
           sb / nb AS mean_b_usd,
           (sa / na - sb / nb)
             / sqrt((qa - sa * sa / na) / (na - 1.0) / na
                    + (qb - sb * sb / nb) / (nb - 1.0) / nb) AS t_welch,
           ((qa - sa * sa / na) / (na - 1.0) / na
            + (qb - sb * sb / nb) / (nb - 1.0) / nb)
           * ((qa - sa * sa / na) / (na - 1.0) / na
              + (qb - sb * sb / nb) / (nb - 1.0) / nb)
             / ((qa - sa * sa / na) / (na - 1.0) / na
                * ((qa - sa * sa / na) / (na - 1.0) / na) / (na - 1.0)
                + (qb - sb * sb / nb) / (nb - 1.0) / nb
                  * ((qb - sb * sb / nb) / (nb - 1.0) / nb) / (nb - 1.0))
             AS dof_satterthwaite
    FROM m
    """,
)
def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between cohorts A/B (o_custkey % 2 —
    a deterministic hash split, the production A/B assignment pattern)
    over order value in FLOOR-ed whole dollars (floor of a positive
    2-decimal double is exact and identical in both engines, and keeps
    the sum of squares inside BIGINT up to sf~10 — cents overflowed at
    sf0.1 under ANSI mode).

    Exactness: the five moments (n, Σx, Σx² per cohort) are BIGINT sums of
    integer dollars — associative, order-free — folded into ONE conditional
    hash aggregate (single scan, map-side combinable). The t statistic and
    Welch–Satterthwaite dof are then closed-form doubles of those exact
    moments, with the expression tree written identically on both engines
    so every IEEE rounding step matches (same discipline as
    q_corr_manual)."""
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        (F.col("o_custkey") % 2).alias("cohort"),
        F.floor("o_totalprice").cast("long").alias("usd"),
    )
    m = x.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("double")
        .alias("nb"),
        F.sum(F.when(F.col("cohort") == 0, F.col("usd")).otherwise(0))
        .cast("double")
        .alias("sa"),
        F.sum(F.when(F.col("cohort") == 1, F.col("usd")).otherwise(0))
        .cast("double")
        .alias("sb"),
        F.sum(
            F.when(F.col("cohort") == 0, F.col("usd") * F.col("usd")).otherwise(0)
        )
        .cast("double")
        .alias("qa"),
        F.sum(
            F.when(F.col("cohort") == 1, F.col("usd") * F.col("usd")).otherwise(0)
        )
        .cast("double")
        .alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb = F.col("sa"), F.col("sb")
    qa, qb = F.col("qa"), F.col("qb")
    se2a = (qa - sa * sa / na) / (na - F.lit(1.0)) / na
    se2b = (qb - sb * sb / nb) / (nb - F.lit(1.0)) / nb
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        (sa / na).alias("mean_a_usd"),
        (sb / nb).alias("mean_b_usd"),
        ((sa / na - sb / nb) / F.sqrt(se2a + se2b)).alias("t_welch"),
        (
            (se2a + se2b)
            * (se2a + se2b)
            / (
                se2a * se2a / (na - F.lit(1.0))
                + se2b * se2b / (nb - F.lit(1.0))
            )
        ).alias("dof_satterthwaite"),
    )


# ---------------------------------------------------------------------------
# q_cuped — CUPED variance reduction from a pre-period covariate
# ---------------------------------------------------------------------------
_CUPED_CUT = "2024-01-16"  # pre-period/measurement split (corpus spans Jan 2024)


@register(
    "q_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_CUT}'
                           THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_CUT}'
                           THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
           (n * syy - sy * sy) / (n * n) AS var_y,
           (n * syy - sy * sy) / (n * n)
             - ((n * sxy - sx * sy) / (n * n))
               * ((n * sxy - sx * sy) / (n * sxx - sx * sx)) AS var_cuped,
           (((n * sxy - sx * sy) / (n * n))
               * ((n * sxy - sx * sy) / (n * sxx - sx * sx)))
             / ((n * syy - sy * sy) / (n * n)) AS var_reduction
    FROM m
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. 2013): regress each user's measurement-period metric y on their
    pre-period covariate x and report how much metric variance the
    adjustment y − θx removes — var_reduction is exactly the squared
    x↔y correlation, the number an experimentation platform quotes when
    it promises 'this test needs 40% less traffic'. Complements
    q_ab_welch (the test itself) with the variance-reduction preprocessing
    every production A/B engine bolts in front of it.

    Scale shape: one per-user conditional hash aggregate (the same
    user-grain shuffle every feature here rides), one scalar moment
    rollup, closed-form doubles at the end. Exactness: x and y are BIGINT
    floor-dollars, the six moments are exact integer sums, and θ /
    var_y / var_cuped are fixed-shape expression trees written
    identically in both engines (the q_corr_manual discipline —
    population-variance form, no libm)."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("date")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts").cast("date") < cut, F.floor("value").cast("long"))
            .otherwise(0)
        ).cast("long").alias("x"),
        F.sum(
            F.when(F.col("ts").cast("date") >= cut, F.floor("value").cast("long"))
            .otherwise(0)
        ).cast("long").alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("long").cast("double").alias("sx"),
        F.sum("y").cast("long").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    cov = (n * sxy - sx * sy) / (n * n)
    var_y = (n * syy - sy * sy) / (n * n)
    return m.select(
        n.cast("long").alias("n_users"),
        theta.alias("theta"),
        var_y.alias("var_y"),
        (var_y - cov * theta).alias("var_cuped"),
        ((cov * theta) / var_y).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# q_power_analysis — required sample size per arm from measured variance
# ---------------------------------------------------------------------------
# normal quantiles as rendered literals (no libm on either engine):
# z_{0.975} and z_{0.8} to full double precision
_PWR_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
_PWR_Z_BETA = 0.8416212335729143  # power = 0.80
_PWR_MDE_REL = 0.02  # minimum detectable effect: 2% of the mean


@register(
    "q_power_analysis",
    oracle=f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                           * CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) AS q
      FROM orders
    )
    SELECT CAST(n AS BIGINT) AS n_pop,
           s / n AS mean_usd,
           (q - s * s / n) / (n - 1.0) AS var_usd,
           (s / n) * {_PWR_MDE_REL!r} AS mde_usd,
           CAST(ceil(
             ({_PWR_Z_ALPHA!r} + {_PWR_Z_BETA!r})
             * ({_PWR_Z_ALPHA!r} + {_PWR_Z_BETA!r})
             * 2.0 * ((q - s * s / n) / (n - 1.0))
             / (((s / n) * {_PWR_MDE_REL!r}) * ((s / n) * {_PWR_MDE_REL!r}))
           ) AS BIGINT) AS n_required_per_arm
    FROM m
    """,
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planning from the metric's MEASURED variance:
    n per arm = (z_α/2 + z_β)²·2σ²/δ² for a {mde:.0%} minimum detectable
    effect at α=0.05, power 0.8 — the question asked before q_ab_welch
    is ever run, and the baseline q_cuped's var_reduction discounts
    (required traffic scales by 1 − ρ²). Normal quantiles are rendered
    double literals, NOT libm calls, so both engines evaluate the same
    closed form bitwise-identically.

    Scale shape: ONE scalar hash aggregate over exact BIGINT
    floor-dollar moments (map-side combinable), then a single-row closed
    form. ceil of a shared double is unambiguous in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    usd = F.floor("o_totalprice").cast("long")
    m = orders.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(usd).cast("long").cast("double").alias("s"),
        F.sum(usd * usd).cast("long").cast("double").alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    var = (q - s * s / n) / (n - F.lit(1.0))
    mde = (s / n) * F.lit(_PWR_MDE_REL)
    z2 = F.lit(_PWR_Z_ALPHA + _PWR_Z_BETA) * F.lit(_PWR_Z_ALPHA + _PWR_Z_BETA)
    return m.select(
        n.cast("long").alias("n_pop"),
        (s / n).alias("mean_usd"),
        var.alias("var_usd"),
        mde.alias("mde_usd"),
        F.ceil(z2 * F.lit(2.0) * var / (mde * mde)).cast("long").alias(
            "n_required_per_arm"
        ),
    )


q_power_analysis.__doc__ = q_power_analysis.__doc__.format(mde=_PWR_MDE_REL)


# ---------------------------------------------------------------------------
# q_neyman_allocation — variance-optimal stratified sampling design
# ---------------------------------------------------------------------------
_NEY_TOTAL = 1000  # total sample budget to allocate across strata


@register(
    "q_neyman_allocation",
    oracle=f"""
    WITH st AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) AS q
      FROM events GROUP BY event_type
    ),
    w AS (
      SELECT event_type, n_pop,
             sqrt((q - s * s / n_pop) / (n_pop - 1.0)) AS sd_cents,
             n_pop * sqrt((q - s * s / n_pop) / (n_pop - 1.0)) AS wgt
      FROM st
      WHERE n_pop > 1 AND q * n_pop > s * s
    ),
    denom AS (
      SELECT list_reduce(list(wgt ORDER BY event_type), (a, b) -> a + b)
               AS total_wgt
      FROM w
    )
    SELECT event_type, n_pop, sd_cents,
           wgt / total_wgt AS alloc_share,
           CAST(floor({_NEY_TOTAL} * wgt / total_wgt) AS BIGINT) AS n_alloc
    FROM w, denom
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation: split a {t}-row sampling budget across the
    event-type strata proportionally to N_h·σ_h — the variance-optimal
    design (Neyman 1934) behind every stratified data-quality audit and
    eval-set draw; pairs with q_stratified_sample (which draws) and
    q_power_analysis (which sizes) as the design step.

    Determinism: per-stratum moments are exact BIGINT cent sums and σ_h
    is one closed form — but Σ_h N_h·σ_h is a float sum over strata,
    which has NO defined order in a plain aggregate. The denominator is
    therefore a SEQUENTIAL FOLD over the stratum weights sorted by the
    unique stratum key (F.aggregate over array_sort / list_reduce over
    list(... ORDER BY)) — the _dot fold-order contract lifted from array
    elements to aggregation, making the one cross-stratum float sum
    bitwise-reproducible. Plan: one conditional hash aggregate, a
    |strata|-sized fold, a broadcast scalar back onto |strata| rows."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.sum(cents).cast("long").cast("double").alias("s"),
        F.sum(cents * cents).cast("long").cast("double").alias("q"),
    )
    n, s, q = F.col("n_pop"), F.col("s"), F.col("q")
    sd = F.sqrt((q - s * s / n) / (n - F.lit(1.0)))
    w = st.filter((n > 1) & (q * n > s * s)).select(
        "event_type", "n_pop", sd.alias("sd_cents"), (n * sd).alias("wgt")
    )
    denom = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_type", "wgt"))),
                lambda x: x["wgt"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("total_wgt")
    )
    share = F.col("wgt") / F.col("total_wgt")
    return w.crossJoin(F.broadcast(denom)).select(
        "event_type",
        "n_pop",
        "sd_cents",
        share.alias("alloc_share"),
        F.floor(F.lit(_NEY_TOTAL) * share).cast("long").alias("n_alloc"),
    )


q_neyman_allocation.__doc__ = q_neyman_allocation.__doc__.format(t=_NEY_TOTAL)


# ---------------------------------------------------------------------------
# q_funnel_windowed — strict-sequence funnel with a per-step deadline
# ---------------------------------------------------------------------------
_FW_DAY_US = 86_400 * 1_000_000


@register(
    "q_funnel_windowed",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(s1.t1) AS t1
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click'
        AND epoch_us(e.ts) >= s1.t1
        AND epoch_us(e.ts) <= s1.t1 + {_WEEK_US}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3, MIN(s2.t2) AS t2
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) >= s2.t2
        AND epoch_us(e.ts) <= s2.t2 + {_WEEK_US}
      GROUP BY e.user_id
    ),
    n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signup FROM s1),
    h2 AS (
      SELECT (t2 - t1) // {_FW_DAY_US} AS lag_days,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM s2 GROUP BY 1
    ),
    h3 AS (
      SELECT (t3 - t2) // {_FW_DAY_US} AS lag_days,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM s3 GROUP BY 1
    ),
    t2t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tot FROM h2),
    t3t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tot FROM h3)
    SELECT 'click' AS step, h2.lag_days, h2.n_users,
           CAST(h2.n_users AS DOUBLE) / t2t.tot AS step_share,
           CAST(t2t.tot AS DOUBLE) / n1.n_signup AS funnel_rate
    FROM h2, t2t, n1
    UNION ALL
    SELECT 'purchase', h3.lag_days, h3.n_users,
           CAST(h3.n_users AS DOUBLE) / t3t.tot,
           CAST(t3t.tot AS DOUBLE) / n1.n_signup
    FROM h3, t3t, n1
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel: signup → click → purchase where each step only
    counts within {d} days of the PREVIOUS step's anchor (first qualifying
    click after signup, first qualifying purchase after that click) — the
    strict-sequence semantics growth teams mean by 'D7 conversion', which
    q_funnel's unbounded version overstates. Per surviving step, the
    day-grain lag histogram plus the step's share and the funnel rate
    vs the signup cohort.

    Scale shape (round-7 shuffle diet, round-8 bounded-state fix): the
    chained deadline anchors are three stacked window-mins over ONE
    user_id partitioning — t1 = min signup, t2 = min click in
    [t1, t1+{d}d] (the min of the qualifying set IS its first element,
    so this equals the old sorted-array head), t3 = min purchase in
    [t2, t2+{d}d]. Per-group state is three scalars — NO collect_list,
    so a celebrity user (zipf skew twin) costs sort time, never an
    unspillable aggregation buffer (the round-8 ADVICE fix: the previous
    form collected every click/purchase per user). The groupBy(user_id)
    that dedups to one row per user reuses the window's hash
    partitioning — no extra exchange. The day-grain histograms for BOTH
    steps plus the signup cohort count ride one (step, lag) aggregate,
    with totals attached by windows over that ≤3×{d}-row frame instead
    of crossJoin(broadcast(scalar)) pairs. Plan: 2 data-sized shuffles
    (user window+agg, step-lag agg) — was 18. Determinism: anchors are exact
    integer microseconds compared and differenced exactly; the two
    ratios are single exact-integer divisions. Timestamps difference as
    raw µs, and the lag division only ever sees non-negatives (Spark DIV
    truncates, DuckDB // floors — they agree there)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type")
        .filter(F.col("event_type").isin("signup", "click", "purchase"))
    )
    w_user = Window.partitionBy("user_id")
    anchored_ev = (
        ev.withColumn(
            "t1",
            F.min(
                F.when(F.col("event_type") == "signup", F.col("us"))
            ).over(w_user),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") >= F.col("t1"))
                    & (F.col("us") <= F.col("t1") + _WEEK_US),
                    F.col("us"),
                )
            ).over(w_user),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("t2"))
                    & (F.col("us") <= F.col("t2") + _WEEK_US),
                    F.col("us"),
                )
            ).over(w_user),
        )
    )
    anchored = anchored_ev.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    entries = F.expr(
        "filter(array("
        " struct('signup' as step, cast(0 as bigint) as lag_days, t1 as anchor),"
        f" struct('click' as step, (t2 - t1) DIV {_FW_DAY_US} as lag_days, t2 as anchor),"
        f" struct('purchase' as step, (t3 - t2) DIV {_FW_DAY_US} as lag_days, t3 as anchor)"
        "), s -> s.anchor IS NOT NULL)"
    )
    hist = (
        anchored.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.step").alias("step"), F.col("e.lag_days").alias("lag_days"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    w_step = Window.partitionBy("step")
    w_all = Window.partitionBy()
    return (
        hist.withColumn("tot", F.sum("n_users").over(w_step).cast("long"))
        .withColumn(
            "n_signup",
            F.sum(
                F.when(F.col("step") == "signup", F.col("n_users"))
            )
            .over(w_all)
            .cast("long"),
        )
        .filter(F.col("step") != "signup")
        .select(
            "step",
            "lag_days",
            "n_users",
            (F.col("n_users").cast("double") / F.col("tot")).alias("step_share"),
            (F.col("tot").cast("double") / F.col("n_signup")).alias(
                "funnel_rate"
            ),
        )
    )


q_funnel_windowed.__doc__ = q_funnel_windowed.__doc__.format(d=7)


# ---------------------------------------------------------------------------
# q_ab_sequential — daily peeking-safe A/B monitoring with a spending
# boundary
# ---------------------------------------------------------------------------
_SEQ_C = 2.5  # O'Brien-Fleming-style boundary constant: z_bound = c/sqrt(t)

_SEQ_VAR_A = "(qa - sa * sa / na) / (na - 1.0) / na"
_SEQ_VAR_B = "(qb - sb * sb / nb) / (nb - 1.0) / nb"


@register(
    "q_ab_sequential",
    oracle=f"""
    WITH x AS (
      SELECT o_custkey % 2 AS cohort,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS usd,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS day
      FROM orders
    ),
    daily AS (
      SELECT day,
             CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dna,
             CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dnb,
             CAST(SUM(CASE WHEN cohort = 0 THEN usd ELSE 0 END) AS BIGINT) AS dsa,
             CAST(SUM(CASE WHEN cohort = 1 THEN usd ELSE 0 END) AS BIGINT) AS dsb,
             CAST(SUM(CASE WHEN cohort = 0 THEN usd * usd ELSE 0 END) AS BIGINT) AS dqa,
             CAST(SUM(CASE WHEN cohort = 1 THEN usd * usd ELSE 0 END) AS BIGINT) AS dqb
      FROM x GROUP BY day
    ),
    cum AS (
      SELECT day,
             CAST(SUM(dna) OVER w AS BIGINT) AS cna,
             CAST(SUM(dnb) OVER w AS BIGINT) AS cnb,
             CAST(SUM(dsa) OVER w AS BIGINT) AS csa,
             CAST(SUM(dsb) OVER w AS BIGINT) AS csb,
             CAST(SUM(dqa) OVER w AS BIGINT) AS cqa,
             CAST(SUM(dqb) OVER w AS BIGINT) AS cqb
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    tot AS (
      SELECT CAST(SUM(dna) + SUM(dnb) AS BIGINT) AS ntot FROM daily
    ),
    z AS (
      SELECT day, cna, cnb,
             CAST(cna AS DOUBLE) AS na, CAST(cnb AS DOUBLE) AS nb,
             CAST(csa AS DOUBLE) AS sa, CAST(csb AS DOUBLE) AS sb,
             CAST(cqa AS DOUBLE) AS qa, CAST(cqb AS DOUBLE) AS qb,
             CAST(cna + cnb AS DOUBLE) / ntot AS info_frac
      FROM cum, tot
      WHERE cna >= 2 AND cnb >= 2
    )
    SELECT day, cna AS n_a, cnb AS n_b,
           sa / na AS mean_a_usd, sb / nb AS mean_b_usd,
           (sa / na - sb / nb) / sqrt({_SEQ_VAR_A} + {_SEQ_VAR_B}) AS z_welch,
           info_frac,
           {_SEQ_C} / sqrt(info_frac) AS z_boundary,
           CAST(ABS((sa / na - sb / nb) / sqrt({_SEQ_VAR_A} + {_SEQ_VAR_B}))
                >= {_SEQ_C} / sqrt(info_frac) AS BIGINT) AS crossed
    FROM z
    WHERE {_SEQ_VAR_A} + {_SEQ_VAR_B} > 0.0
    """,
)
def q_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential (peeking-safe) A/B monitoring: q_ab_welch's cohorts
    tracked DAY BY DAY with cumulative moments, each day's Welch z
    compared to an O'Brien-Fleming-style spending boundary
    z_bound = {c}/√(information fraction) — steep early, ≈{c} at full
    information — so an experimenter who looks every day still controls
    the false-positive rate. `crossed` marks the days a sequential
    procedure would have stopped; the single-shot q_ab_welch is this
    table's last row without the boundary.

    Scale shape: ONE conditional day-grain hash aggregate over orders
    (map-side combinable, the corpus's only shuffle), then cumulative
    sums and the z/boundary expressions on the bounded day-grain rows —
    the running window never sees individual orders. Determinism: the
    six cumulative moments are exact BIGINTs (floor-dollar discipline,
    q_ab_welch); z, boundary and the crossing flag are fixed-shape
    doubles of those integers (sqrt is IEEE-exact), written identically
    in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        (F.col("o_custkey") % 2).alias("cohort"),
        F.floor(F.col("o_totalprice")).cast("long").alias("usd"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day"),
    )

    def _csum(cond, expr):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0))).cast("long")

    a, b = F.col("cohort") == 0, F.col("cohort") == 1
    usd = F.col("usd")
    daily = x.groupBy("day").agg(
        _csum(a, F.lit(1)).alias("dna"),
        _csum(b, F.lit(1)).alias("dnb"),
        _csum(a, usd).alias("dsa"),
        _csum(b, usd).alias("dsb"),
        _csum(a, usd * usd).alias("dqa"),
        _csum(b, usd * usd).alias("dqb"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        *[
            F.sum(f"d{c}").over(w).cast("long").alias(f"c{c}")
            for c in ("na", "nb", "sa", "sb", "qa", "qb")
        ],
    )
    tot = daily.agg(
        (F.sum("dna") + F.sum("dnb")).cast("long").alias("ntot")
    )
    na, nb = F.col("cna").cast("double"), F.col("cnb").cast("double")
    sa, sb = F.col("csa").cast("double"), F.col("csb").cast("double")
    qa, qb = F.col("cqa").cast("double"), F.col("cqb").cast("double")
    var_a = (qa - sa * sa / na) / (na - 1.0) / na
    var_b = (qb - sb * sb / nb) / (nb - 1.0) / nb
    zcol = (sa / na - sb / nb) / F.sqrt(var_a + var_b)
    info = (F.col("cna") + F.col("cnb")).cast("double") / F.col("ntot")
    bound = F.lit(_SEQ_C) / F.sqrt(info)
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("cna") >= 2) & (F.col("cnb") >= 2))
        .filter(var_a + var_b > 0.0)
        .select(
            "day",
            F.col("cna").alias("n_a"),
            F.col("cnb").alias("n_b"),
            (sa / na).alias("mean_a_usd"),
            (sb / nb).alias("mean_b_usd"),
            zcol.alias("z_welch"),
            info.alias("info_frac"),
            bound.alias("z_boundary"),
            (F.abs(zcol) >= bound).cast("long").alias("crossed"),
        )
    )


q_ab_sequential.__doc__ = q_ab_sequential.__doc__.format(c=_SEQ_C)


# ---------------------------------------------------------------------------
# q_diff_in_diff — two-cohort pre/post causal contrast on order value
# ---------------------------------------------------------------------------
# pre/post boundary: the midpoint of the observed order-day span, computed
# in-query (exact integers) so the contrast survives testdata regeneration


def _did_cell_sql(c: int, post: int) -> str:
    cond = f"cohort = {c} AND post = {post}"
    return (
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_{c}{post},\n"
        f"CAST(SUM(CASE WHEN {cond} THEN usd ELSE 0 END) AS BIGINT) AS s_{c}{post},\n"
        f"CAST(SUM(CASE WHEN {cond} THEN usd * usd ELSE 0 END) AS BIGINT) AS q_{c}{post}"
    )


def _did_var_sql(c: int, p: int) -> str:
    n, s, q = f"CAST(n_{c}{p} AS DOUBLE)", f"CAST(s_{c}{p} AS DOUBLE)", f"CAST(q_{c}{p} AS DOUBLE)"
    return f"({q} - {s} * {s} / {n}) / ({n} - 1.0) / {n}"


@register(
    "q_diff_in_diff",
    oracle=f"""
    WITH d0 AS (
      SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS day,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    b AS (SELECT (MIN(day) + MAX(day)) // 2 AS split_day FROM d0),
    x AS (
      SELECT o_custkey % 2 AS cohort,
             CAST(day >= split_day AS INT) AS post,
             usd
      FROM d0, b
    ),
    m AS (
      SELECT
        {_did_cell_sql(0, 0)},
        {_did_cell_sql(0, 1)},
        {_did_cell_sql(1, 0)},
        {_did_cell_sql(1, 1)}
      FROM x
    )
    SELECT
      CAST(s_10 AS DOUBLE) / n_10 AS mean_treat_pre,
      CAST(s_11 AS DOUBLE) / n_11 AS mean_treat_post,
      CAST(s_00 AS DOUBLE) / n_00 AS mean_ctrl_pre,
      CAST(s_01 AS DOUBLE) / n_01 AS mean_ctrl_post,
      (CAST(s_11 AS DOUBLE) / n_11 - CAST(s_10 AS DOUBLE) / n_10)
        - (CAST(s_01 AS DOUBLE) / n_01 - CAST(s_00 AS DOUBLE) / n_00) AS did,
      sqrt({_did_var_sql(1, 1)} + {_did_var_sql(1, 0)}
           + {_did_var_sql(0, 1)} + {_did_var_sql(0, 0)}) AS se,
      ((CAST(s_11 AS DOUBLE) / n_11 - CAST(s_10 AS DOUBLE) / n_10)
        - (CAST(s_01 AS DOUBLE) / n_01 - CAST(s_00 AS DOUBLE) / n_00))
        / sqrt({_did_var_sql(1, 1)} + {_did_var_sql(1, 0)}
               + {_did_var_sql(0, 1)} + {_did_var_sql(0, 0)}) AS t_stat
    FROM m
    WHERE n_00 >= 2 AND n_01 >= 2 AND n_10 >= 2 AND n_11 >= 2
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the causal contrast (treat_post −
    treat_pre) − (ctrl_post − ctrl_pre) between the two deterministic
    custkey cohorts around a fixed intervention date, with the
    four-cell Welch standard error and t statistic — the quasi-
    experimental design used when assignment wasn't randomized at the
    moment of the change. The intervention date is the exact midpoint of
    the observed order-day span ((min+max) DIV 2 — non-negative, so
    Spark's truncating DIV and DuckDB's flooring // agree), computed
    in-query rather than pinned to a literal. Completes the experimentation family: Welch
    (one shot) → sequential (peeking) → CUPED (variance reduction) →
    DiD (parallel-trends counterfactual).

    Scale shape: ONE conditional scan aggregate produces all 12 cell
    moments (map-side combinable; no shuffle key at all — a scalar
    rollup), then the estimate is a closed-form expression. Determinism:
    the floor-dollar BIGINT moment discipline of q_ab_welch; DiD, SE
    (IEEE sqrt) and t are fixed-shape doubles of exact integers in both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    d0 = orders.select(
        (F.col("o_custkey") % 2).alias("cohort"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day"),
        F.floor(F.col("o_totalprice")).cast("long").alias("usd"),
    )
    b = d0.agg(
        F.expr("(MIN(day) + MAX(day)) DIV 2").alias("split_day")
    )
    x = d0.crossJoin(F.broadcast(b)).select(
        "cohort",
        (F.col("day") >= F.col("split_day")).cast("int").alias("post"),
        "usd",
    )
    aggs = []
    for c in (0, 1):
        for p in (0, 1):
            cell = (F.col("cohort") == c) & (F.col("post") == p)
            aggs += [
                F.sum(F.when(cell, 1).otherwise(0)).cast("long").alias(f"n_{c}{p}"),
                F.sum(F.when(cell, F.col("usd")).otherwise(0))
                .cast("long")
                .alias(f"s_{c}{p}"),
                F.sum(F.when(cell, F.col("usd") * F.col("usd")).otherwise(0))
                .cast("long")
                .alias(f"q_{c}{p}"),
            ]
    m = x.agg(*aggs)

    def mean(c, p):
        return F.col(f"s_{c}{p}").cast("double") / F.col(f"n_{c}{p}")

    def var(c, p):
        n = F.col(f"n_{c}{p}").cast("double")
        s = F.col(f"s_{c}{p}").cast("double")
        q = F.col(f"q_{c}{p}").cast("double")
        return (q - s * s / n) / (n - 1.0) / n

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(var(1, 1) + var(1, 0) + var(0, 1) + var(0, 0))
    return m.filter(
        (F.col("n_00") >= 2)
        & (F.col("n_01") >= 2)
        & (F.col("n_10") >= 2)
        & (F.col("n_11") >= 2)
    ).select(
        mean(1, 0).alias("mean_treat_pre"),
        mean(1, 1).alias("mean_treat_post"),
        mean(0, 0).alias("mean_ctrl_pre"),
        mean(0, 1).alias("mean_ctrl_post"),
        did.alias("did"),
        se.alias("se"),
        (did / se).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# q_srm_check — sample-ratio-mismatch guardrail for the A/B assignment
# ---------------------------------------------------------------------------
# chi-square(1df) critical value at alpha = 0.001 — the industry SRM
# threshold (Fabijan et al. 2019); a literal, so no CDF/erf dependency
_SRM_CRIT = 10.828


@register(
    "q_srm_check",
    oracle=f"""
    WITH u AS (
      SELECT user_id % 2 AS cohort FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM u
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(na AS DOUBLE) / (na + nb) AS ratio_a,
           CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb) AS chi2,
           CAST(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb)
                > {_SRM_CRIT} AS BIGINT) AS srm_detected
    FROM m
    WHERE na + nb > 0
    """,
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: before reading ANY experiment
    metric, test whether the unit-level 50/50 hash assignment actually
    produced a 50/50 split — a skewed ratio means broken randomization
    (redirect bugs, bot filtering, logging loss) and invalidates every
    downstream readout. Chi-square goodness-of-fit against equal
    expected counts collapses to (n_a − n_b)²/(n_a + n_b) for two cells;
    the verdict compares against the literal 1-df α=0.001 critical value
    ({c}) — the industry threshold — so no CDF is evaluated anywhere.
    First gate of the experimentation family (SRM → Welch → sequential →
    CUPED → DiD → FDR).

    Scale shape: one per-user distinct aggregate (the same user_id
    shuffle every experiment op rides) and a two-cell scalar rollup.
    Determinism: counts are exact BIGINTs; the statistic is one
    fixed-shape division; the flag compares against a literal."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select((F.col("user_id") % 2).alias("cohort"), "user_id").distinct()
    m = u.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    na, nb = F.col("na"), F.col("nb")
    chi2 = ((na - nb) * (na - nb)).cast("double") / (na + nb)
    return m.filter(na + nb > 0).select(
        na.alias("n_a"),
        nb.alias("n_b"),
        (na.cast("double") / (na + nb)).alias("ratio_a"),
        chi2.alias("chi2"),
        (chi2 > _SRM_CRIT).cast("long").alias("srm_detected"),
    )


q_srm_check.__doc__ = q_srm_check.__doc__.format(c=_SRM_CRIT)
