"""Iterative graph analytics: PageRank over the customer–supplier trade
graph, in EXACT integer fixed-point so the whole iteration is
oracle-checkable.

Complements clustering.py's connected components (the other iterative
graph operator): CC propagates min-labels to convergence; PageRank
propagates weighted mass a fixed number of rounds. Floating-point PageRank
is NOT engine-reproducible (per-node in-edge sums have no defined order),
so ranks here live in BIGINT micro-units: every step is integer multiply /
floor-divide / integer sum — associative, order-free, bitwise-identical in
any engine. The same trick production systems use to make iterative jobs
restart-deterministic.

Lineage: generalizes the reference's star-ish FK structure
(sql_config.yaml:6,38 — fact tables keyed to a shared dimension) into the
graph the keys span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table

_PR_SCALE = 10**12  # rank mass fixed-point scale (micro-units of SCALE)
_PR_ITERS = 4
_PR_TOP = 20
# damping 0.85 as the exact rational 85/100 (multiply-then-floor-divide)
_PR_D_NUM, _PR_D_DEN = 85, 100


def _pr_oracle_sql() -> str:
    """Unrolled fixed-iteration PageRank as one DuckDB CTE chain — the
    integer arithmetic makes each unrolled step equal Spark's loop step."""
    teleport = (
        f"(({_PR_D_DEN - _PR_D_NUM} * ({_PR_SCALE} // n.n_nodes)) "
        f"// {_PR_D_DEN})"
    )
    its = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        its.append(f"""
    r{i} AS MATERIALIZED (
      SELECT d.node, d.d,
             CAST({teleport}
                  + (({_PR_D_NUM} * CAST(SUM({prev}.r // {prev}.d) AS BIGINT))
                     // {_PR_D_DEN}) AS BIGINT) AS r
      FROM bi
      JOIN {prev} ON bi.src = {prev}.node
      JOIN deg d ON bi.dst = d.node
      CROSS JOIN n
      GROUP BY d.node, d.d, n.n_nodes
    )""")
        prev = f"r{i}"
    iters_sql = ",".join(its)
    return f"""
    -- MATERIALIZED: DuckDB inlines plain CTEs, so the unrolled iteration
    -- chain would re-derive the edge list once per level (456 s at sf0.1;
    -- 3 s materialized) — the oracle-side twin of the Spark plan's
    -- localCheckpoint lineage cuts. Results are identical either way.
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    bi AS MATERIALIZED (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS d FROM bi GROUP BY src),
    n AS MATERIALIZED (SELECT COUNT(*) AS n_nodes FROM deg),
    r0 AS MATERIALIZED (
      SELECT node, d, ({_PR_SCALE} // n.n_nodes) AS r FROM deg CROSS JOIN n
    ),
    {iters_sql}
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           r AS rank_fp
    FROM {prev}
    ORDER BY rank_fp DESC, node_id ASC
    LIMIT {_PR_TOP}
    """


@register("q_pagerank", oracle=_pr_oracle_sql())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_PR_ITERS}-round PageRank (damping 0.85) over the undirected
    customer↔supplier graph induced by lineitem×orders, in BIGINT
    fixed-point: r₀ = SCALE/N (floor); each round every node sends
    floor(r/deg) along its edges and receives teleport +
    floor(0.85 · Σ incoming). Top-{_PR_TOP} nodes by final mass.

    Plan shape per round: edges ⋈ ranks on src (shuffle on node id) →
    hash-agg sum by dst → join back degrees — the Pregel superstep
    expressed as joins, with a FIXED round count so the lazy plan is one
    static DAG (no driver-side convergence action at all, unlike CC's
    per-round scalar; fixed-round + residual-check-at-the-end is the
    production trade for rank-style algorithms). At 100 TB the edge list
    is pre-partitioned by src once and every superstep reuses that
    partitioning; ranks (|V| rows) are the only iterating state. Integer
    fixed-point makes the result independent of partitioning, join order,
    and engine — the property the oracle proves.

    Exchange accounting (round-8 audit, pinned by
    tests/test_graph_exchange_reuse.py): the STATIC plan carries ~7
    exchanges per iteration (the count PLANS.md reports), but AQE's
    exchange reuse collapses the repeats at runtime — measured at
    sf0.001: 21 static Exchange nodes → 7 executed ShuffleQueryStages
    with 6 ReusedExchange, i.e. the edge list, degree table, and node
    count each shuffle exactly ONCE and the marginal cost of a superstep
    is the single dst-side aggregation shuffle the Pregel model requires.
    Settled-mass pruning (the q_shortest_path diet) does NOT apply:
    power iteration is a dense update — teleport plus re-weighted
    incoming mass changes every node's rank every round, so no node ever
    leaves the frontier."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bi = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # LAZY lineage cut (materializes with the query's own action): the edge
    # list and degree table feed every superstep — without the cut the
    # static DAG re-derives the lineitem⨝orders distinct 9 times (plan
    # audit: 51 exchanges), with it each is computed once and reused, the
    # exact "persist the edge list before iterating" rule every Pregel-like
    # job follows (same pattern as clustering.connected_components).
    bi = bi.localCheckpoint(eager=False)
    deg = bi.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    ).localCheckpoint(eager=False)
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))

    teleport = F.expr(
        f"({_PR_D_DEN - _PR_D_NUM} * ({_PR_SCALE} DIV n_nodes)) "
        f"DIV {_PR_D_DEN}"
    )
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "node", "d", F.expr(f"{_PR_SCALE} DIV n_nodes").alias("r")
    )
    for _ in range(_PR_ITERS):
        contribs = bi.join(ranks, bi["src"] == ranks["node"]).select(
            F.col("dst"), F.expr("r DIV d").alias("c")
        )
        summed = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            deg.join(summed, deg["node"] == summed["dst"])
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                "d",
                (
                    teleport
                    + F.expr(f"({_PR_D_NUM} * s) DIV {_PR_D_DEN}")
                ).alias("r"),
            )
        )
    return (
        ranks.select(
            F.col("node").alias("node_id"),
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.col("r").alias("rank_fp"),
        )
        .orderBy(F.col("rank_fp").desc(), F.col("node_id").asc())
        .limit(_PR_TOP)
    )


# ---------------------------------------------------------------------------
# q_label_propagation — frequency-based LPA communities, fixed rounds
# ---------------------------------------------------------------------------
_LPA_ITERS = 3
_LPA_TOP = 20


def _lpa_oracle_sql() -> str:
    """Unrolled synchronous LPA as a DuckDB CTE chain. Each round every
    node adopts the MOST FREQUENT label among its neighbors, ties broken by
    smallest label — a total order, so the fixed-round result is a
    deterministic function of the edge list (no RNG, unlike classic
    asynchronous LPA)."""
    its = []
    prev = "l0"
    for i in range(1, _LPA_ITERS + 1):
        its.append(f"""
    l{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM (
          SELECT bi.dst AS node, p.label, COUNT(*) AS c
          FROM bi JOIN {prev} p ON bi.src = p.node
          GROUP BY bi.dst, p.label
        )
      ) WHERE rn = 1
    )""")
        prev = f"l{i}"
    iters_sql = ",".join(its)
    return f"""
    WITH pairs AS MATERIALIZED (
      -- repeat-trade edges only (>= 2 co-orders): the raw bipartite graph
      -- is dense enough that LPA collapses to 2 giant labels; thresholding
      -- on edge weight is the standard sparsification for community
      -- structure (36 communities vs 2 at sf0.01)
      SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    bi AS MATERIALIZED (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM bi),
    {iters_sql}
    SELECT CAST(label AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM {prev}
    GROUP BY label
    ORDER BY n_members DESC, community
    LIMIT {_LPA_TOP}
    """


@register("q_label_propagation", oracle=_lpa_oracle_sql())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous frequency-LPA over the
    customer↔supplier trade graph (q_pagerank's graph, thresholded to
    repeat-trade edges), {_LPA_ITERS} fixed rounds, reporting the
    top-{_LPA_TOP} communities by size.

    Determinism: classic LPA is order-dependent (async updates, random
    tie-breaks); this variant is synchronous (round i reads only round
    i-1's labels) with (count DESC, label ASC) tie-breaks, so the result
    is engine-independent — proven by the unrolled-CTE oracle.

    Plan shape per round: edges ⋈ labels on src (one shuffle) → count by
    (dst, label) hash-agg → per-dst argmax window. The window partitions
    by dst — the SAME key the aggregate just shuffled on, so the sort is
    within already-colocated partitions. Edge list is lineage-cut once and
    reused by all rounds (the Pregel persist rule); labels (|V| rows) are
    the only iterating state, exactly what survives a 100 TB edge list."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        # repeat-trade edges only (>= 2 co-orders) — see oracle comment:
        # sparsification that preserves community structure
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    bi = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = bi.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    from pyspark.sql.window import Window

    for _ in range(_LPA_ITERS):
        counted = (
            bi.join(labels, bi["src"] == labels["node"])
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("dst").orderBy(F.col("c").desc(), F.col("label"))
        labels = (
            counted.select(
                F.col("dst").alias("node"),
                "label",
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(
            F.col("label").cast("long").alias("community"),
            F.col("n_members").cast("long").alias("n_members"),
        )
        .orderBy(F.col("n_members").desc(), "community")
        .limit(_LPA_TOP)
    )
