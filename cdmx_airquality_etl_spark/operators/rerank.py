"""Retrieval re-ranking batch: MMR diversification, pseudo-relevance
query expansion (Rocchio), and reciprocal-rank fusion.

Lineage: the similarity batch (operators/similarity.py) produces candidate
rankings; this batch adds the second-stage re-rankers an LLM retrieval
stack runs ON those candidates — diversify (MMR), refine the query from
its own results (PRF), and fuse independent rankings (RRF). All three
operate on a TakeOrdered candidate pool (top-k rows), so the expensive
corpus pass happens once and the re-rank logic — however iterative — runs
on a bounded set; that division of labor is what makes the operators
100 TB-viable.

Determinism: cosines reuse the order-stable fold (_dot/_sql_cos); every
argmax carries a vec_id tiebreak; the Rocchio centroid uses the
fixed-point exact means of vector_stats.py; RRF scores are a fixed
two-term expression."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.parquet import load_table
from .similarity import _SQL_NZ_CTE, _dot, _nonzero, _sql_cos, _sql_dot
from .vector_stats import _Q

_MMR_POOL = 20
_MMR_K = 5
_PRF_FEEDBACK = 5
_PRF_TOPK = 10
_RRF_C = 60
_RRF_TOPK = 10


def _scored_candidates(spark: SparkSession, sf_dir: str, pool: int | None = None):
    """Shared retrieval scaffold: (nonzero corpus, scored candidates).

    Scored = every non-query vector with its guarded cosine relevance to
    vec_id 0 (`rel`); with `pool` set, cut to the top-`pool` TakeOrdered
    candidate set. Every re-ranker builds on this one derivation."""
    emb = _nonzero(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label", "embedding", "qe",
            (
                _dot("embedding", "qe")
                / (F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("qe", "qe")))
            ).alias("rel"),
        )
    )
    if pool is not None:
        cand = cand.orderBy(F.col("rel").desc(), "vec_id").limit(pool)
    return emb, cand


# ---------------------------------------------------------------------------
# q_mmr_rerank — maximal marginal relevance over the candidate pool
# ---------------------------------------------------------------------------
def _mmr_oracle_sql() -> str:
    """Unrolled MMR selection: level i picks the pool row maximizing
    rel − max(sim to already-selected), tiebreak vec_id."""
    parts = [f"""
    sel1 AS (
      SELECT vec_id, rel, CAST(1 AS BIGINT) AS pick
      FROM pool ORDER BY rel DESC, vec_id LIMIT 1
    )"""]
    prev = "sel1"
    for i in range(2, _MMR_K + 1):
        parts.append(f"""
    best{i} AS (
      SELECT p.vec_id, p.rel,
             MAX(pr.sim) AS msim
      FROM pool p
      JOIN {prev} s ON TRUE
      JOIN pairs pr ON ((pr.vec_a = p.vec_id AND pr.vec_b = s.vec_id)
                     OR (pr.vec_b = p.vec_id AND pr.vec_a = s.vec_id))
      WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})
      GROUP BY p.vec_id, p.rel
    ),
    sel{i} AS (
      SELECT * FROM {prev}
      UNION ALL
      SELECT vec_id, rel, CAST({i} AS BIGINT) AS pick
      FROM (
        SELECT vec_id, rel FROM best{i}
        ORDER BY rel - msim DESC, vec_id LIMIT 1
      )
    )"""
        )
        prev = f"sel{i}"
    return f"""
    WITH {_SQL_NZ_CTE},
    q AS (SELECT embedding AS qe FROM nz WHERE vec_id = 0),
    pool AS (
      SELECT e.vec_id, e.embedding,
             {_sql_cos('e.embedding', 'q.qe')} AS rel
      FROM nz e, q WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id LIMIT {_MMR_POOL}
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_sql_cos('a.embedding', 'b.embedding')} AS sim
      FROM pool a JOIN pool b ON a.vec_id < b.vec_id
    ),
    {", ".join(p.strip() for p in parts)}
    SELECT pick, vec_id, rel FROM {prev}
    """


@register("q_mmr_rerank", oracle=_mmr_oracle_sql())
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (λ = 1/2, scores compared as
    rel − max-sim-to-selected): pick the most relevant candidate, then
    greedily add the candidate maximizing relevance minus redundancy —
    the diversification pass RAG retrieval runs so five near-identical
    chunks don't fill the context window. The selection loop is UNROLLED
    over the top-{pool} candidate pool: the corpus is scanned once for
    the pool (TakeOrdered), the {pool}×{pool} pairwise sims once, and
    each of the {k} levels is a join+argmax over ≤{pool} rows — iterative
    logic, bounded data, no driver collect."""
    _, cand = _scored_candidates(spark, sf_dir, _MMR_POOL)
    pool = cand.select("vec_id", "embedding", "rel").localCheckpoint(eager=False)
    a = pool.alias("a")
    b = pool.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                _dot("a.embedding", "b.embedding")
                / (
                    F.sqrt(_dot("a.embedding", "a.embedding"))
                    * F.sqrt(_dot("b.embedding", "b.embedding"))
                )
            ).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    sel = (
        pool.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select("vec_id", "rel", F.lit(1).cast("bigint").alias("pick"))
    )
    for i in range(2, _MMR_K + 1):
        remaining = pool.join(sel.select("vec_id"), "vec_id", "left_anti")
        sym = pairs.select("vec_a", "vec_b", "sim").unionByName(
            pairs.select(
                F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"), "sim"
            )
        )
        scored = (
            remaining.join(sym, remaining.vec_id == sym.vec_a)
            .join(sel.select(F.col("vec_id").alias("sv")), F.col("vec_b") == F.col("sv"))
            .groupBy(remaining.vec_id, "rel")
            .agg(F.max("sim").alias("msim"))
        )
        nxt = (
            scored.orderBy((F.col("rel") - F.col("msim")).desc(), "vec_id")
            .limit(1)
            .select("vec_id", "rel", F.lit(i).cast("bigint").alias("pick"))
        )
        sel = sel.unionByName(nxt).localCheckpoint(eager=False)
    return sel.select("pick", "vec_id", "rel")


q_mmr_rerank.__doc__ = q_mmr_rerank.__doc__.format(pool=_MMR_POOL, k=_MMR_K)


# ---------------------------------------------------------------------------
# q_query_expansion — Rocchio pseudo-relevance feedback
# ---------------------------------------------------------------------------
@register(
    "q_query_expansion",
    oracle=f"""
    WITH {_SQL_NZ_CTE},
    q AS (SELECT embedding AS qe FROM nz WHERE vec_id = 0),
    first_pass AS (
      SELECT e.vec_id, e.embedding,
             {_sql_cos('e.embedding', 'q.qe')} AS rel
      FROM nz e, q WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id LIMIT {_PRF_FEEDBACK}
    ),
    comp AS (
      SELECT dim,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * {_Q}) AS BIGINT) AS w
      FROM first_pass, unnest(range(1, len(embedding) + 1)) AS t(dim)
    ),
    cent AS (
      SELECT dim, CAST(CAST(SUM(w) AS DOUBLE) / ({_PRF_FEEDBACK}.0 * {_Q}.0) AS DOUBLE) AS c
      FROM comp GROUP BY dim
    ),
    cvec AS (SELECT list(c ORDER BY dim) AS cv FROM cent),
    second_pass AS (
      SELECT e.vec_id,
             row_number() OVER (
               ORDER BY {_sql_cos('e.embedding', 'cvec.cv')} DESC, e.vec_id) AS rnk2
      FROM nz e, cvec WHERE e.vec_id <> 0
    ),
    orig AS (
      SELECT e.vec_id,
             row_number() OVER (
               ORDER BY {_sql_cos('e.embedding', 'q.qe')} DESC, e.vec_id) AS rnk1
      FROM nz e, q WHERE e.vec_id <> 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS overlap_at_k
    FROM orig JOIN second_pass USING (vec_id)
    WHERE rnk1 <= {_PRF_TOPK} AND rnk2 <= {_PRF_TOPK}
    """,
)
def q_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio, pure feedback form): take the
    top-{f} first-pass results, form their EXACT fixed-point centroid
    (the q_label_centroids discipline — no float-mean nondeterminism),
    re-rank the corpus against that centroid, and report the top-{k}
    overlap between the original and expanded rankings — the drift
    metric that says how much the query moved. Two corpus passes plus a
    {f}-row centroid; at scale both passes are the same TakeOrdered scan
    q_similarity_topk runs."""
    emb, scored = _scored_candidates(spark, sf_dir)
    first_pass = (
        scored.select("vec_id", "embedding", "rel")
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_PRF_FEEDBACK)
    )
    comp = first_pass.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select("dim", F.floor(F.col("x").cast("double") * _Q).cast("bigint").alias("w"))
    cent = comp.groupBy("dim").agg(
        (F.sum("w").cast("double") / (F.lit(float(_PRF_FEEDBACK)) * F.lit(float(_Q)))).alias("c")
    )
    cvec = cent.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).c.alias("cv")
    )
    second = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(cvec))
    cos2 = _dot("embedding", "cv") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("cv", "cv"))
    )
    rnk2 = second.select(
        "vec_id",
        F.row_number().over(Window.orderBy(cos2.desc(), F.col("vec_id"))).alias("rnk2"),
    )
    rnk1 = scored.select(
        "vec_id",
        F.row_number().over(Window.orderBy(F.col("rel").desc(), F.col("vec_id"))).alias("rnk1"),
    )
    return (
        rnk1.join(rnk2, "vec_id")
        .filter((F.col("rnk1") <= _PRF_TOPK) & (F.col("rnk2") <= _PRF_TOPK))
        .agg(F.count(F.lit(1)).alias("overlap_at_k"))
    )


q_query_expansion.__doc__ = q_query_expansion.__doc__.format(
    f=_PRF_FEEDBACK, k=_PRF_TOPK
)


# ---------------------------------------------------------------------------
# q_rank_fusion — reciprocal-rank fusion of two retrieval rankings
# ---------------------------------------------------------------------------
@register(
    "q_rank_fusion",
    oracle=f"""
    WITH {_SQL_NZ_CTE},
    q AS (SELECT embedding AS qe, label AS ql FROM nz WHERE vec_id = 0),
    cos_rank AS (
      SELECT e.vec_id,
             row_number() OVER (
               ORDER BY {_sql_cos('e.embedding', 'q.qe')} DESC, e.vec_id) AS r1
      FROM nz e, q WHERE e.vec_id <> 0
    ),
    dot_rank AS (
      SELECT e.vec_id,
             row_number() OVER (
               ORDER BY {_sql_dot('e.embedding', 'q.qe')} DESC, e.vec_id) AS r2
      FROM nz e, q WHERE e.vec_id <> 0
    )
    SELECT vec_id,
           CAST(r1 AS BIGINT) AS cos_rank,
           CAST(r2 AS BIGINT) AS dot_rank,
           CAST(1.0 / ({_RRF_C} + r1) + 1.0 / ({_RRF_C} + r2) AS DOUBLE) AS rrf
    FROM cos_rank JOIN dot_rank USING (vec_id)
    ORDER BY rrf DESC, vec_id
    LIMIT {_RRF_TOPK}
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two independent retrieval orderings —
    cosine (normalized) and raw dot product (magnitude-sensitive) —
    RRF(d) = Σ 1/(c + rank_i), c = {c}: the standard way to combine
    rankings without score calibration (the hybrid-search staple that
    fuses lexical BM25 with dense retrieval in production; here both
    rankers come from the same embedding corpus so the fusion is fully
    oracle-checkable). Each ranking is a window over the candidate set;
    the fusion joins on vec_id and evaluates ONE fixed two-term
    expression — no float accumulation order to diverge."""
    _, scored = _scored_candidates(spark, sf_dir)
    dp = _dot("embedding", "qe")
    r1 = scored.select(
        "vec_id",
        F.row_number().over(Window.orderBy(F.col("rel").desc(), F.col("vec_id"))).alias("r1"),
    )
    r2 = scored.select(
        "vec_id",
        F.row_number().over(Window.orderBy(dp.desc(), F.col("vec_id"))).alias("r2"),
    )
    return (
        r1.join(r2, "vec_id")
        .select(
            "vec_id",
            F.col("r1").cast("bigint").alias("cos_rank"),
            F.col("r2").cast("bigint").alias("dot_rank"),
            (
                F.lit(1.0) / (F.lit(_RRF_C) + F.col("r1"))
                + F.lit(1.0) / (F.lit(_RRF_C) + F.col("r2"))
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "vec_id")
        .limit(_RRF_TOPK)
    )


q_rank_fusion.__doc__ = q_rank_fusion.__doc__.format(c=_RRF_C)
