"""Behavioral-analytics batch: marketing attribution, DAU/WAU stickiness,
conversion lag, interval merging, and power-user concentration.

Lineage: completes the event-analytics surface (q_funnel, q_retention,
q_sessionize, q_event_transitions in analytics.py) with the next queries a
product-analytics consumer runs over the same event stream. Every operator
aggregates the stream to a per-user or per-day grain first (one
map-combined shuffle) and runs its window logic on that grain — the
bounded-partition discipline of the existing batch.

Determinism: timestamps compare as raw values; argmin/argmax over touches
break ties on (ts, event_id) — a total order; all ratios divide exact
integer counts once."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table

_ATTR_WINDOW_DAYS = 7
_LTV_TOP_PCT = 10  # power users = top 10% by event count
_ORDER_SPAN_DAYS = 30  # order activity interval length


# ---------------------------------------------------------------------------
# q_attribution — first-touch vs last-touch conversion attribution
# ---------------------------------------------------------------------------
@register(
    "q_attribution",
    oracle=f"""
    WITH conv AS (
      SELECT user_id, ts AS cts, event_id AS cid FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT c.cid, t.event_type, t.ts, t.event_id
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.ts < c.cts
       AND t.ts >= c.cts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
    ),
    ranked AS (
      SELECT cid, event_type,
             row_number() OVER (PARTITION BY cid ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY cid ORDER BY ts DESC, event_id DESC) AS rl
      FROM pairs
    )
    SELECT model, event_type, CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM (
      SELECT 'first_touch' AS model, event_type FROM ranked WHERE rf = 1
      UNION ALL
      SELECT 'last_touch' AS model, event_type FROM ranked WHERE rl = 1
    )
    GROUP BY model, event_type
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase credits the user's first and
    last qualifying touch (click/view within the preceding {w} days),
    producing the first-touch vs last-touch model comparison in one
    result. The conversion↔touch join is per-user with a bounded time
    band; the argmin/argmax resolve by row_number over each conversion's
    touch set (bounded by touches-per-user-week) with a total (ts,
    event_id) order. Purchases with no qualifying touch are unattributed
    and drop — by design, both models must credit the same conversion
    set."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    pairs = conv.join(
        touch,
        (touch.user_id == conv.cu)
        & (touch.ts < conv.cts)
        & (touch.ts >= conv.cts - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")),
    )
    wf = Window.partitionBy("cid").orderBy("ts", "event_id")
    wl = Window.partitionBy("cid").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = pairs.select(
        "cid", "event_type",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    first = ranked.filter(F.col("rf") == 1).select(
        F.lit("first_touch").alias("model"), "event_type"
    )
    last = ranked.filter(F.col("rl") == 1).select(
        F.lit("last_touch").alias("model"), "event_type"
    )
    return first.unionByName(last).groupBy("model", "event_type").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


q_attribution.__doc__ = q_attribution.__doc__.format(w=_ATTR_WINDOW_DAYS)


# ---------------------------------------------------------------------------
# q_stickiness — DAU/WAU engagement ratio per week
# ---------------------------------------------------------------------------
@register(
    "q_stickiness",
    oracle="""
    WITH d AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
             user_id
      FROM events
    ),
    dau AS (
      SELECT CAST(floor(day / 7.0) AS BIGINT) AS wk, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY CAST(floor(day / 7.0) AS BIGINT), day
    ),
    wau AS (
      SELECT CAST(floor(day / 7.0) AS BIGINT) AS wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM d GROUP BY CAST(floor(day / 7.0) AS BIGINT)
    )
    SELECT dau.wk AS wk,
           CAST(SUM(dau.dau) AS BIGINT) AS dau_sum,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(wau.wau) AS BIGINT) AS wau,
           CAST(CAST(SUM(dau.dau) AS DOUBLE)
                / (CAST(COUNT(*) AS DOUBLE) * CAST(MAX(wau.wau) AS DOUBLE)) AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.wk = wau.wk
    GROUP BY dau.wk
    """,
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per epoch-week: average daily active users over
    weekly active users — the engagement-frequency metric (1.0 = every
    weekly user active every observed day). Two distinct-count aggregates
    on the (week, day) and week grains; the ratio divides exact integers
    once. Weeks are floor(epoch-day / 7) on BOTH sides (DuckDB's integer //
    truncates toward zero, diverging from Spark's floor on pre-epoch
    days — the q_division_semantics trap, pinned here by using floor in
    both engines)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    d = ev.select(day.alias("day"), "user_id")
    dau = d.groupBy(F.floor(F.col("day") / 7).cast("bigint").alias("wk"), "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = d.groupBy(F.floor(F.col("day") / 7).cast("bigint").alias("wk")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "wk")
        .groupBy("wk")
        .agg(
            F.sum("dau").alias("dau_sum"),
            F.count(F.lit(1)).alias("n_days"),
            F.max("wau").alias("wau"),
            (
                F.sum("dau").cast("double")
                / (F.count(F.lit(1)).cast("double") * F.max("wau").cast("double"))
            ).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# q_conversion_lag — days from first view to first purchase, histogrammed
# ---------------------------------------------------------------------------
@register(
    "q_conversion_lag",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(datediff('day', CAST(first_view AS DATE), CAST(first_purchase AS DATE)) AS BIGINT) AS lag_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM firsts
    WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase >= first_view
    GROUP BY 1
    """,
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: calendar days between each user's
    first view and first purchase (users who purchased before ever
    viewing, or never did both, drop out). One conditional-min aggregate
    per user, then a histogram on the day lag — both exact. The funnel's
    temporal twin: q_funnel counts WHO converts, this measures HOW LONG
    conversion takes."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return (
        firsts.filter(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .groupBy(
            F.datediff(
                F.col("first_purchase").cast("date"), F.col("first_view").cast("date")
            ).cast("bigint").alias("lag_days")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q_interval_merge — coalesce overlapping activity intervals per customer
# ---------------------------------------------------------------------------
@register(
    "q_interval_merge",
    oracle=f"""
    WITH iv AS (
      SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + {_ORDER_SPAN_DAYS} AS BIGINT) AS e
      FROM orders
    ),
    marked AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY o_custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT o_custkey, s, e,
             SUM(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e) AS island
      FROM marked
    ),
    merged AS (
      SELECT o_custkey, island, MIN(s) AS ms, MAX(e) AS me, COUNT(*) AS n_orders
      FROM islands GROUP BY o_custkey, island
    )
    SELECT o_custkey AS c_custkey,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_days
    FROM merged GROUP BY o_custkey
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (the union-of-ranges operator): each order
    opens a {d}-day activity interval; overlapping intervals per customer
    merge into islands via the running-max-of-end identity (a new island
    starts exactly when the next start exceeds every prior end). Output
    per customer: orders, merged interval count, and total covered days —
    the dedup-aware activity footprint that naive SUM(span) double-counts.
    Windows partition per customer (bounded by orders-per-customer);
    day arithmetic is exact integers."""
    orders = load_table(spark, sf_dir, "orders")
    s = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    iv = orders.select(
        "o_custkey", s.alias("s"), (s + _ORDER_SPAN_DAYS).alias("e")
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0),
    )
    islands = marked.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = islands.groupBy("o_custkey", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me"), F.count(F.lit(1)).alias("n_orders")
    )
    return merged.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum("n_orders").alias("n_orders"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).alias("covered_days"),
    )


q_interval_merge.__doc__ = q_interval_merge.__doc__.format(d=_ORDER_SPAN_DAYS)


# ---------------------------------------------------------------------------
# q_power_users — activity concentration in the top decile
# ---------------------------------------------------------------------------
@register(
    "q_power_users",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, n,
             row_number() OVER (ORDER BY n DESC, user_id) AS rn,
             COUNT(*) OVER () AS n_users,
             SUM(n) OVER () AS n_events
      FROM per_user
    )
    SELECT CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN rn * {_LTV_TOP_PCT} <= n_users THEN 1 ELSE 0 END) AS BIGINT) AS n_power_users,
           CAST(MAX(n_events) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN rn * {_LTV_TOP_PCT} <= n_users THEN n ELSE 0 END) AS BIGINT) AS power_events,
           CAST(CAST(SUM(CASE WHEN rn * {_LTV_TOP_PCT} <= n_users THEN n ELSE 0 END) AS DOUBLE)
                / CAST(MAX(n_events) AS DOUBLE) AS DOUBLE) AS power_share
    FROM ranked
    """,
)
def q_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: the share of all events generated by the
    top-decile users (exact integer decile cut, rn·10 ≤ n — the
    q_top_percent discipline on the user grain). One aggregate to the
    user grain, one rank window over users (5-6 orders of magnitude
    smaller than the stream), one summary row. The 80/20 sanity check
    every engagement dashboard leads with."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "user_id")
    ranked = per_user.select(
        "user_id", "n",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_users"),
        F.sum("n").over(Window.partitionBy()).alias("n_events"),
    )
    is_power = F.col("rn") * _LTV_TOP_PCT <= F.col("n_users")
    return ranked.agg(
        F.max("n_users").alias("n_users"),
        F.sum(F.when(is_power, 1).otherwise(0)).alias("n_power_users"),
        F.max("n_events").alias("n_events"),
        F.sum(F.when(is_power, F.col("n")).otherwise(0)).alias("power_events"),
        (
            F.sum(F.when(is_power, F.col("n")).otherwise(0)).cast("double")
            / F.max("n_events").cast("double")
        ).alias("power_share"),
    )


# ---------------------------------------------------------------------------
# q_kaplan_meier — survival curve over user lifetimes (ordered-fold product)
# ---------------------------------------------------------------------------
@register(
    "q_kaplan_meier",
    oracle="""
    WITH life AS (
      SELECT user_id,
             CAST(datediff('day', DATE '1970-01-01', CAST(MIN(ts) AS DATE))
                  AS BIGINT) AS first_day,
             CAST(datediff('day', DATE '1970-01-01', CAST(MAX(ts) AS DATE))
                  AS BIGINT) AS last_day
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(last_day) AS h FROM life),
    spans AS (
      SELECT last_day - first_day AS t,
             CASE WHEN last_day < h THEN 1 ELSE 0 END AS churned
      FROM life, horizon
    ),
    deaths AS (
      SELECT t, CAST(SUM(churned) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM spans GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(leaving) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk
      FROM deaths
    ),
    factors AS (
      SELECT t, d, n_at_risk,
             CAST(n_at_risk - d AS DOUBLE) / n_at_risk AS f
      FROM risk
    )
    SELECT x.t AS lifetime_days, x.d AS n_churned, x.n_at_risk,
           list_reduce(
             list_prepend(1.0, list(y.f ORDER BY y.t2)),
             (a, b) -> a * b) AS survival
    FROM factors x JOIN (SELECT t AS t2, f FROM factors) y
      ON y.t2 <= x.t
    GROUP BY x.t, x.d, x.n_at_risk
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival over user lifetimes: S(t) = prod_{t_i <= t}
    (1 − d_i/n_i) with users whose last activity touches the corpus
    horizon treated as CENSORED (still alive — the estimator's point;
    naive churn curves count them dead). Lifetimes are day-grain, so the
    event-time axis is calendar-bounded and the per-t factor table is
    tiny; the cumulative product folds the t-ORDERED factor list
    identically in both engines (Spark aggregate / DuckDB list_reduce —
    the q_cramers_v ordered-fold rule; NO exp-sum-log, whose libm calls
    aren't correctly rounded). The prefix-product-per-row shape is the
    triangular self-join over the bounded factor table — |days|² pairs at
    most, data-size-independent. n_at_risk is a descending running sum of
    exact counts."""
    events = load_table(spark, sf_dir, "events")
    life = events.groupBy("user_id").agg(
        F.datediff(F.to_date(F.min("ts")), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("first_day"),
        F.datediff(F.to_date(F.max("ts")), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("last_day"),
    )
    horizon = life.agg(F.max("last_day").alias("h"))
    spans = life.crossJoin(F.broadcast(horizon)).select(
        (F.col("last_day") - F.col("first_day")).alias("t"),
        F.when(F.col("last_day") < F.col("h"), 1).otherwise(0).alias("churned"),
    )
    deaths = spans.groupBy("t").agg(
        F.sum("churned").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = deaths.select(
        "t", "d", F.sum("leaving").over(w).cast("long").alias("n_at_risk")
    )
    factors = risk.select(
        "t",
        "d",
        "n_at_risk",
        ((F.col("n_at_risk") - F.col("d")).cast("double") / F.col("n_at_risk")).alias(
            "f"
        ),
    )
    x = factors.alias("x")
    y = factors.select(F.col("t").alias("t2"), F.col("f").alias("f2")).alias("y")
    return (
        x.join(F.broadcast(y), F.col("y.t2") <= F.col("x.t"))
        .groupBy("x.t", "x.d", "x.n_at_risk")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("y.t2"), F.col("y.f2")))),
                F.lit(1.0),
                lambda acc, s: acc * s["f2"],
            ).alias("survival")
        )
        .select(
            F.col("t").alias("lifetime_days"),
            F.col("d").alias("n_churned"),
            "n_at_risk",
            "survival",
        )
    )


# ---------------------------------------------------------------------------
# q_burstiness — per-user inter-arrival dispersion (CV² of gaps)
# ---------------------------------------------------------------------------
_BURST_MIN_GAPS = 8  # dispersion over fewer gaps is noise, not behavior


@register(
    "q_burstiness",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS d
      FROM events
    ),
    stats AS (
      SELECT user_id,
             CAST(COUNT(d) AS BIGINT) AS n_gaps,
             CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd,
             CAST(SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sd2
      FROM gaps WHERE d IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           CAST(sd AS DOUBLE) / n_gaps / 1000000.0 AS mean_gap_s,
           (n_gaps * CAST(sd2 AS DOUBLE))
             / (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) - 1.0 AS cv2
    FROM stats
    WHERE n_gaps >= {_BURST_MIN_GAPS} AND sd > 0
    """,
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness: the squared coefficient of variation of
    inter-event gaps (CV² = Var/Mean² = n·Σd²/(Σd)² − 1). CV² ≈ 1 is a
    memoryless Poisson visitor; CV² ≫ 1 is a bursty one — the standard
    dispersion feature for bot filtering and engagement modeling, and the
    behavioral twin of q_outlier_mad's magnitude outliers. Lineage: the
    reference's hourly re-scrape cadence check (scrapper.py:249-267) is
    this statistic's degenerate fixed-interval case.

    Scale shape: ONE window pass partitioned by user_id (the same shuffle
    grain every per-user feature here rides), then a hash aggregate to the
    three sufficient statistics. Determinism (SURVEY §5.1): gaps are exact
    epoch-microsecond BIGINTs, Σd and Σd² accumulate in DECIMAL(38,0)
    (order-independent — gaps ≤ ~1e13 µs so Σd² ≤ ~1e30 over any real
    user), and cv2/mean_gap_s are each ONE final fixed-shape double
    expression over those exact stats. The sd > 0 guard drops the
    all-events-same-instant degenerate user in both engines."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    dd = F.col("d").cast("decimal(38,0)")
    stats = gaps.groupBy("user_id").agg(
        F.count("d").alias("n_gaps"),
        F.sum(dd).cast("decimal(38,0)").alias("sd"),
        F.sum(dd * dd).cast("decimal(38,0)").alias("sd2"),
    )
    return stats.filter(
        (F.col("n_gaps") >= _BURST_MIN_GAPS) & (F.col("sd") > 0)
    ).select(
        "user_id",
        "n_gaps",
        (F.col("sd").cast("double") / F.col("n_gaps") / 1000000.0).alias(
            "mean_gap_s"
        ),
        (
            F.col("n_gaps") * F.col("sd2").cast("double")
            / (F.col("sd").cast("double") * F.col("sd").cast("double"))
            - 1.0
        ).alias("cv2"),
    )


# ---------------------------------------------------------------------------
# q_markov_attribution — removal-effect (data-driven) channel attribution
# ---------------------------------------------------------------------------
_MK_ITERS = 12  # absorption iterations; journeys here are far shorter
_MK_CHANNELS = ("click", "error", "signup", "view")  # purchase = conversion


def _mk_scen_rows() -> list[tuple[str, str]]:
    return [("base", "")] + [(f"no_{c}", c) for c in _MK_CHANNELS]


def _mk_oracle() -> str:
    scen_values = ", ".join(f"('{s}', '{r}')" for s, r in _mk_scen_rows())
    its = []
    prev = "v0"
    for i in range(1, _MK_ITERS + 1):
        its.append(f"""
    v{i} AS MATERIALIZED (
      SELECT sc.scenario, t.src AS state,
             CASE WHEN t.src = sc.removed THEN 0.0
                  ELSE COALESCE(list_reduce(
                         list(t.p * pv.v ORDER BY t.dst), (a, b) -> a + b),
                       0.0)
             END AS v
      FROM trans t
      JOIN {prev} pv ON pv.state = t.dst
      JOIN scen sc ON sc.scenario = pv.scenario
      GROUP BY sc.scenario, t.src, sc.removed
      UNION ALL
      SELECT scenario, state, v FROM absorbing
    )""")
        prev = f"v{i}"
    return f"""
    WITH ev2 AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      FROM events
    ),
    firstp AS (
      SELECT user_id, us AS pus, event_id AS pid
      FROM (
        SELECT user_id, us, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS rn
        FROM ev2 WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    seqs AS (
      SELECT e.user_id,
             ['start']
               || list(e.event_type ORDER BY e.us, e.event_id)
                    FILTER (WHERE f.pus IS NULL
                            OR e.us < f.pus
                            OR (e.us = f.pus AND e.event_id < f.pid))
               || [CASE WHEN f.pus IS NULL THEN 'null' ELSE 'conv' END]
               AS seq
      FROM ev2 e LEFT JOIN firstp f USING (user_id)
      WHERE e.event_type <> 'purchase'
      GROUP BY e.user_id, f.pus, f.pid
    ),
    pairs AS (
      SELECT seq[i.i] AS src, seq[i.i + 1] AS dst
      FROM seqs, unnest(range(1, len(seq))) AS i(i)
    ),
    counts AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY src, dst
    ),
    outm AS (SELECT src, CAST(SUM(c) AS BIGINT) AS tot FROM counts GROUP BY src),
    trans AS (
      SELECT counts.src, counts.dst,
             CAST(counts.c AS DOUBLE) / outm.tot AS p
      FROM counts JOIN outm USING (src)
    ),
    scen(scenario, removed) AS (VALUES {scen_values}),
    absorbing AS (
      SELECT scenario, s.state, s.v
      FROM scen, (VALUES ('conv', 1.0), ('null', 0.0)) AS s(state, v)
    ),
    v0 AS (
      SELECT sc.scenario, st.src AS state, 0.0 AS v
      FROM scen sc, (SELECT DISTINCT src FROM trans) st
      UNION ALL
      SELECT scenario, state, v FROM absorbing
    ),
    {", ".join(its)},
    pconv AS (
      SELECT scenario, v AS p_conv FROM {prev} WHERE state = 'start'
    ),
    base AS (SELECT p_conv AS p_base FROM pconv WHERE scenario = 'base'),
    eff AS (
      SELECT substr(scenario, 4) AS channel,
             p_base, p_conv AS p_conv_without,
             (p_base - p_conv) / p_base AS removal_effect
      FROM pconv, base
      WHERE scenario <> 'base' AND p_base > 0.0
    ),
    norm AS (
      SELECT list_reduce(
               list(CASE WHEN removal_effect > 0.0 THEN removal_effect
                         ELSE 0.0 END ORDER BY channel),
               (a, b) -> a + b) AS tot_eff
      FROM eff
    )
    SELECT channel, p_base AS p_conv_base, p_conv_without, removal_effect,
           CASE WHEN tot_eff > 0.0
                THEN (CASE WHEN removal_effect > 0.0 THEN removal_effect
                           ELSE 0.0 END) / tot_eff
                ELSE 0.0 END AS attribution_share
    FROM eff, norm
    """


@register("q_markov_attribution", oracle=_mk_oracle())
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution — the model that
    replaced first/last-touch in production marketing stacks (Anderl et
    al. 2014): build the journey transition graph (start → touches →
    conv/null, journeys cut at the first purchase), compute conversion
    absorption probability by {it} value-iteration steps, and per channel
    re-run the absorption with that channel REMOVED (its state forced to
    the null value); a channel's credit is the normalized drop in
    conversion probability. Complements q_attribution's positional
    heuristics with the counterfactual answer.

    Scale shape: the corpus pays the per-user journey assembly (one
    window-free collect per user, bounded by journey length) and ONE
    transition hash aggregate; the matrix is then ≤|event_types|+2 states
    squared BY CONSTRUCTION, so the whole 5-scenario × {it}-step value
    iteration collapses into ONE native higher-order-function expression
    (aggregate over a step sequence, map_from_entries state lookup) on a
    single collected-row frame — zero per-iteration jobs, zero Python-RDD
    scans, zero checkpoints. (A first cut ran the iteration as a loop of
    40-row DataFrame joins; each tiny step stalled for minutes feeding the
    local-relation scans through Python workers — the fold-as-expression
    shape is both the scale-honest and the fast plan.)
    Determinism: transition probabilities are one exact division each;
    every cross-state float sum (the value-iteration inner product, the
    share normalization) is a SEQUENTIAL FOLD over key-sorted arrays
    (the q_neyman_allocation discipline), so all {it} iterations are
    bitwise-reproducible in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    # round-12 (guide §2.4, the q_shapley_attribution transform): the
    # first purchase per user is a whole-partition window min over
    # struct(us, event_id) — same total order the old row_number ranked
    # by — on the SAME user_id partitioning the journey aggregate below
    # reuses, replacing the purchase-filtered row_number window + left
    # join back (two exchanges and a per-user sort). Purchase-only users
    # still vanish with the post-window filter, as they never entered the
    # old touches frame.
    fp = F.min(
        F.when(F.col("event_type") == "purchase", F.struct("us", "event_id"))
    ).over(Window.partitionBy("user_id"))
    touches = ev.withColumn("fp", fp).filter(
        F.col("event_type") != "purchase"
    )
    before_p = F.col("fp").isNull() | (
        F.struct("us", "event_id") < F.col("fp")
    )
    seqs = (
        touches.groupBy("user_id", "fp")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(before_p, F.struct("us", "event_id", "event_type"))
                )
            ).alias("tch")
        )
        .select(
            F.concat(
                F.array(F.lit("start")),
                F.transform(F.col("tch"), lambda x: x["event_type"]),
                F.array(
                    F.when(F.col("fp").isNull(), F.lit("null")).otherwise(
                        F.lit("conv")
                    )
                ),
            ).alias("seq")
        )
    )
    pairs = seqs.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("seq"), 1, F.size("seq") - 1),
                F.slice(F.col("seq"), 2, F.size("seq") - 1),
                lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
            )
        ).alias("pr")
    ).select("pr.src", "pr.dst")
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    outm = counts.groupBy("src").agg(F.sum("c").alias("tot"))
    trans = counts.join(outm, "src").select(
        "src", "dst", (F.col("c").cast("double") / F.col("tot")).alias("p")
    )
    # collapse the bounded matrix to ONE row: `ts` sorted by (src, dst) so
    # every per-src slice the folds below see is already in dst order (the
    # oracle's ORDER BY t.dst), `sts` = all states incl. the absorbing pair
    one = trans.agg(
        F.array_sort(F.collect_list(F.struct("src", "dst", "p"))).alias("ts")
    ).select(
        "ts",
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.transform("ts", lambda t: t["src"]),
                    F.array(F.lit("conv"), F.lit("null")),
                )
            )
        ).alias("sts"),
    )

    def _absorb(removed):
        """P(absorb at conv | start) after _MK_ITERS synchronous value-
        iteration steps with the `removed` channel's state forced to 0,
        as one fold expression over the step sequence."""
        init = F.transform(
            F.col("sts"),
            lambda s: F.struct(
                s.alias("st"),
                F.when(s == "conv", F.lit(1.0))
                .otherwise(F.lit(0.0))
                .alias("v"),
            ),
        )
        final = F.aggregate(
            F.sequence(F.lit(1), F.lit(_MK_ITERS)),
            init,
            lambda acc, _i: F.transform(
                F.col("sts"),
                lambda s: F.struct(
                    s.alias("st"),
                    F.when(s == "conv", F.lit(1.0))
                    .when(s == "null", F.lit(0.0))
                    .when(s == removed, F.lit(0.0))
                    .otherwise(
                        F.aggregate(
                            F.transform(
                                F.filter(F.col("ts"), lambda t: t["src"] == s),
                                lambda t: t["p"]
                                * F.element_at(
                                    F.map_from_entries(acc), t["dst"]
                                ),
                            ),
                            F.lit(0.0),
                            lambda a, b: a + b,
                        )
                    )
                    .alias("v"),
                ),
            ),
        )
        return F.element_at(F.map_from_entries(final), F.lit("start"))

    pc = one.select(
        _absorb(F.lit("")).alias("p_base"),
        *[_absorb(F.lit(c)).alias(f"p_no_{c}") for c in _MK_CHANNELS],
    )
    eff_arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("channel"),
                F.col(f"p_no_{c}").alias("p_conv_without"),
            )
            for c in _MK_CHANNELS
        ]
    )

    def _re(pw):
        return (F.col("p_base") - pw) / F.col("p_base")

    def _clip(x):
        return F.when(x > 0.0, x).otherwise(F.lit(0.0))

    # share normalizer: sequential fold in channel order (_MK_CHANNELS is
    # sorted), bitwise-matching the oracle's list_reduce ORDER BY channel
    tot_eff = F.aggregate(
        eff_arr,
        F.lit(0.0),
        lambda a, e: a + _clip(_re(e["p_conv_without"])),
    )
    return (
        pc.filter(F.col("p_base") > 0.0)
        .select(
            F.explode(eff_arr).alias("e"),
            "p_base",
            tot_eff.alias("tot_eff"),
        )
        .select(
            F.col("e.channel").alias("channel"),
            F.col("p_base").alias("p_conv_base"),
            F.col("e.p_conv_without").alias("p_conv_without"),
            _re(F.col("e.p_conv_without")).alias("removal_effect"),
            F.when(
                F.col("tot_eff") > 0.0,
                _clip(_re(F.col("e.p_conv_without"))) / F.col("tot_eff"),
            )
            .otherwise(F.lit(0.0))
            .alias("attribution_share"),
        )
    )


q_markov_attribution.__doc__ = q_markov_attribution.__doc__.format(it=_MK_ITERS)


# ---------------------------------------------------------------------------
# q_cohort_ltv — cumulative revenue per acquisition cohort by age
# ---------------------------------------------------------------------------
@register(
    "q_cohort_ltv",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 12
                  + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1
                  AS BIGINT) AS mi,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS usd
      FROM orders
    ),
    firstm AS (
      SELECT o_custkey, MIN(mi) AS cohort FROM o GROUP BY o_custkey
    ),
    sizes AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_custs
      FROM firstm GROUP BY cohort
    ),
    cells AS (
      SELECT f.cohort, o.mi - f.cohort AS age_months,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(o.usd) AS BIGINT) AS rev_usd
      FROM o JOIN firstm f USING (o_custkey)
      GROUP BY f.cohort, o.mi - f.cohort
    ),
    cum AS (
      SELECT cohort, age_months, n_orders, rev_usd,
             CAST(SUM(rev_usd) OVER (PARTITION BY cohort ORDER BY age_months
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS cum_rev
      FROM cells
    )
    SELECT c.cohort, c.age_months, s.n_custs, c.n_orders, c.rev_usd,
           c.cum_rev,
           CAST(c.cum_rev AS DOUBLE) / s.n_custs AS ltv_usd
    FROM cum c JOIN sizes s USING (cohort)
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers bucket by the calendar
    month of their FIRST order; each (cohort, months-since-acquisition)
    cell reports that month's orders and revenue plus the running
    cumulative revenue per acquired customer — the LTV curves a
    payback-period model reads off. The revenue twin of q_retention
    (which counts activity, not value).

    Scale shape: one per-customer MIN aggregate, the order stream joined
    back on the same custkey partitioning, then a (cohort × age) cell
    aggregate — output is O(months²) regardless of customer count; the
    cumulative window runs per cohort over those bounded cells and the
    cohort-size dim broadcasts. Determinism: month index is exact
    calendar arithmetic (year·12+month, no locale/week rules), revenue
    uses q_ab_welch's exact floor-dollar discipline, and LTV is one
    division of exact BIGINTs."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate").cast("date")) * 12
            + F.month(F.col("o_orderdate").cast("date"))
            - 1
        )
        .cast("long")
        .alias("mi"),
        F.floor(F.col("o_totalprice")).cast("long").alias("usd"),
    )
    firstm = o.groupBy("o_custkey").agg(F.min("mi").alias("cohort"))
    sizes = firstm.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_custs")
    )
    cells = (
        o.join(firstm, "o_custkey")
        .groupBy("cohort", (F.col("mi") - F.col("cohort")).alias("age_months"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("usd").cast("long").alias("rev_usd"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn(
        "cum_rev", F.sum("rev_usd").over(w).cast("long")
    )
    return cum.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "age_months",
        "n_custs",
        "n_orders",
        "rev_usd",
        "cum_rev",
        (F.col("cum_rev").cast("double") / F.col("n_custs")).alias("ltv_usd"),
    )


# ---------------------------------------------------------------------------
# q_session_paths — top user journeys (session event-type prefixes)
# ---------------------------------------------------------------------------
_PATH_GAP_US = 30 * 60 * 1_000_000  # q_sessionize's 30-minute gap
_PATH_PREFIX = 8  # journey prefix length (bounds the path string at scale)
_PATH_TOP_K = 20


@register(
    "q_session_paths",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_PATH_GAP_US}
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM gaps
    ),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{_PATH_PREFIX}],
               '>') AS path
      FROM sess GROUP BY user_id, session_id
    ),
    counts AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths
      GROUP BY path
    ),
    tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS t FROM counts),
    ranked AS (
      SELECT path, n_sessions,
             CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
                  AS BIGINT) AS rank
      FROM counts
    )
    SELECT path, n_sessions, rank,
           CAST(n_sessions AS DOUBLE) / t AS share
    FROM ranked, tot
    WHERE rank <= {_PATH_TOP_K}
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: q_sessionize's 30-minute-gap sessions reduced to
    their first {k}-event type sequence ('view>click>purchase'), ranked
    by frequency with each path's share of all sessions — the 'what do
    people actually do' table product analytics reads before any funnel
    is designed (funnels test a hypothesized path; this surfaces the
    real ones). The prefix cap bounds the path string regardless of
    session length, so a runaway session can't blow up the key.

    Scale shape: the sessionization windows ride the same user_id
    partitioning every per-user operator reuses; paths aggregate on the
    (user, session) grain, then ONE hash aggregate on the path key and a
    global top-{t} (count-desc, path tiebreak — a total order) via the
    q_sort_limit_topk TakeOrdered discipline; the session total
    broadcasts. Determinism: counts are exact BIGINTs, share is one
    division, and ties cannot reorder across engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > _PATH_GAP_US), 1
    ).otherwise(0)
    sess = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
        F.sum(new_session).over(wsum).alias("session_id"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("us", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                _PATH_PREFIX,
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    tot = counts.agg(F.sum("n_sessions").cast("long").alias("t"))
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    ranked = counts.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).filter(F.col("rank") <= _PATH_TOP_K)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "path",
        "n_sessions",
        "rank",
        (F.col("n_sessions").cast("double") / F.col("t")).alias("share"),
    )


q_session_paths.__doc__ = q_session_paths.__doc__.format(
    k=_PATH_PREFIX, t=_PATH_TOP_K
)


# ---------------------------------------------------------------------------
# q_shapley_attribution — coalition-value (Shapley) channel attribution
# ---------------------------------------------------------------------------
def _shap_terms(i: int, n: int = 4) -> list[tuple[int, int, float]]:
    """(S, S|bit_i, weight) for every coalition S not containing channel i;
    weight = |S|!(n-|S|-1)!/n! — shared by the SQL generator and the Spark
    expression builder so the two engines cannot drift."""
    import math

    out = []
    for s in range(2**n):
        if s & (1 << i):
            continue
        k = bin(s).count("1")
        w = math.factorial(k) * math.factorial(n - k - 1) / math.factorial(n)
        out.append((s, s | (1 << i), w))
    return out


def _shapley_oracle() -> str:
    n = len(_MK_CHANNELS)
    bits = ", ".join(
        f"CAST(SUM(CASE WHEN e.event_type = '{c}' AND (f.pus IS NULL"
        f" OR e.us < f.pus"
        f" OR (e.us = f.pus AND e.event_id < f.pid))"
        f" THEN 1 ELSE 0 END) > 0 AS INT) * {1 << i} AS b{i}"
        for i, c in enumerate(_MK_CHANNELS)
    )
    vcols = ", ".join(
        f"CAST(SUM(CASE WHEN (mask & {s}) = mask THEN n_conv ELSE 0 END)"
        f" AS BIGINT) AS v{s}"
        for s in range(2**n)
    )
    phi = {}
    for i, c in enumerate(_MK_CHANNELS):
        terms = " + ".join(
            f"{w!r} * (CAST(v{s1} AS DOUBLE) - v{s0})"
            for s0, s1, w in _shap_terms(i, n)
        )
        phi[c] = f"({terms})"
    tot_phi = " + ".join(phi[c] for c in _MK_CHANNELS)
    selects = "\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS channel, {phi[c]} AS shapley_conversions,
           CASE WHEN ({tot_phi}) > 0.0
                THEN {phi[c]} / ({tot_phi}) ELSE 0.0 END
             AS attribution_share,
           v{2**n - 1} AS total_conversions, v0 AS baseline_conversions
    FROM vs"""
        for c in _MK_CHANNELS
    )
    return f"""
    WITH ev2 AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      FROM events
    ),
    firstp AS (
      SELECT user_id, us AS pus, event_id AS pid
      FROM (
        SELECT user_id, us, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS rn
        FROM ev2 WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    j AS (
      SELECT e.user_id, {bits},
             CAST(MAX(CASE WHEN f.pus IS NOT NULL THEN 1 ELSE 0 END) AS INT)
               AS conv
      FROM (SELECT user_id, us, event_id, event_type FROM ev2
            WHERE event_type <> 'purchase') e
      LEFT JOIN firstp f USING (user_id)
      GROUP BY e.user_id
    ),
    cells AS (
      SELECT b0 + b1 + b2 + b3 AS mask,
             CAST(SUM(conv) AS BIGINT) AS n_conv
      FROM j GROUP BY 1
    ),
    vs AS (SELECT {vcols} FROM cells)
    {selects}
    """


@register("q_shapley_attribution", oracle=_shapley_oracle())
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution: each channel's credit is its
    average marginal contribution across every coalition of the other
    channels — the order-free, axiomatically fair split (efficiency:
    credits sum to v(all) − v(none)) that complements
    q_markov_attribution's sequence-aware removal effects. Coalition
    value v(S) = converted journeys whose pre-purchase channel set ⊆ S
    (reach monotone by construction).

    Scale shape: the corpus pays ONE per-user journey aggregate (channel
    presence bits + conversion flag — no sequence assembly needed here)
    and one 16-cell mask aggregate; the 2⁴ coalition values and all 32
    weighted marginal terms are a CLOSED-FORM expression over those 16
    exact BIGINTs, generated from the same _shap_terms table in both
    engines — explicit term order, exact factorial-ratio weights, no
    float accumulation beyond the fixed chain. Journeys cut at the first
    purchase exactly like q_markov_attribution."""
    n = len(_MK_CHANNELS)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    # round-12 (guide §2.4): the first purchase per user is a
    # whole-partition window min over struct(us, event_id) — the same
    # total order the old row_number pass ranked by — computed on the
    # SAME user_id partitioning the journey aggregate below needs, so the
    # exchange is established once. This replaces a purchase-filtered
    # row_number window (a per-user sort) PLUS a left join back to the
    # touches (two more exchanges); users whose events are all purchases
    # still vanish with the post-window filter, exactly as they never
    # entered the old touches frame.
    fp = F.min(
        F.when(F.col("event_type") == "purchase", F.struct("us", "event_id"))
    ).over(Window.partitionBy("user_id"))
    touches = ev.withColumn("fp", fp).filter(
        F.col("event_type") != "purchase"
    )
    before_p = F.col("fp").isNull() | (
        F.struct("us", "event_id") < F.col("fp")
    )
    j = touches.groupBy("user_id").agg(
        *[
            (
                (
                    F.sum(
                        F.when(
                            (F.col("event_type") == c) & before_p, 1
                        ).otherwise(0)
                    )
                    > 0
                ).cast("int")
                * (1 << i)
            ).alias(f"b{i}")
            for i, c in enumerate(_MK_CHANNELS)
        ],
        F.max(F.when(F.col("fp").isNotNull(), 1).otherwise(0))
        .cast("int")
        .alias("conv"),
    )
    cells = j.groupBy(
        sum(
            [F.col(f"b{i}") for i in range(1, n)], F.col("b0")
        ).alias("mask")
    ).agg(F.sum("conv").cast("long").alias("n_conv"))
    vs = cells.agg(
        *[
            F.sum(
                F.when(
                    F.col("mask").bitwiseAND(F.lit(s)) == F.col("mask"),
                    F.col("n_conv"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"v{s}")
            for s in range(2**n)
        ]
    )

    def _phi(i: int):
        terms = None
        for s0, s1, w in _shap_terms(i, n):
            t = F.lit(w) * (
                F.col(f"v{s1}").cast("double") - F.col(f"v{s0}")
            )
            terms = t if terms is None else terms + t
        return terms

    tot = None
    for i in range(n):
        tot = _phi(i) if tot is None else tot + _phi(i)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("channel"),
                _phi(i).alias("shapley_conversions"),
                F.when(tot > 0.0, _phi(i) / tot)
                .otherwise(F.lit(0.0))
                .alias("attribution_share"),
                F.col(f"v{2**n - 1}").alias("total_conversions"),
                F.col("v0").alias("baseline_conversions"),
            )
            for i, c in enumerate(_MK_CHANNELS)
        ]
    )
    return vs.select(F.explode(rows).alias("r")).select("r.*")
