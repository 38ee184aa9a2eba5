"""Corpus co-occurrence statistics.

q_cooccur_pmi — collocation / association mining: which token pairs appear
together in documents far more often than independence predicts. The
standard corpus-analysis tool (PMI over document co-occurrence) used to
surface templated boilerplate, topic structure, and tokenizer-merge
candidates before training. Lineage: generalizes the reference's
vocabulary-driven normalization (F-NORM + month catalog, scrapper.py:20-26,
config.yaml:5-17) from single-token decode to pairwise structure.

Exactness: PMI is log(N·c12/(c1·c2)), and log is monotone — so the operator
ranks and emits the RATIO (one bigint multiply each side, then one IEEE
double division), never the log: integer products are exact, the division
is correctly rounded identically in both engines, and the driver's hash
compare holds bitwise. Consumers wanting nats apply log at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table

_MIN_PAIR_DOCS = 25  # support floor: pair must co-occur in ≥ this many docs
_TOP_PAIRS = 20

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


@register(
    "q_cooccur_pmi",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, t
      FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
      WHERE t <> ''
    ),
    tok AS (SELECT t, COUNT(*) AS c FROM dt GROUP BY t),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt),
    pairs AS (
      SELECT a.t AS token_a, b.t AS token_b, COUNT(*) AS pair_docs
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY a.t, b.t
    )
    SELECT p.token_a, p.token_b, p.pair_docs,
           ta.c AS docs_a, tb.c AS docs_b,
           CAST(p.pair_docs * n.n_docs AS DOUBLE)
             / CAST(ta.c * tb.c AS DOUBLE) AS lift
    FROM pairs p
    JOIN tok ta ON p.token_a = ta.t
    JOIN tok tb ON p.token_b = tb.t
    CROSS JOIN n
    WHERE p.pair_docs >= {_MIN_PAIR_DOCS}
    ORDER BY lift DESC, token_a ASC, token_b ASC
    LIMIT {_TOP_PAIRS}
    """,
)
def q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token-pair associations by lift (= exp(PMI)) over document
    co-occurrence, with a support floor.

    Plan: per-doc DISTINCT tokens (explode + distinct — one aggregate that
    also caps each doc's contribution at its vocabulary, not its length) →
    within-doc pair self-join → pair-count hash aggregate → two broadcast
    joins to the token-frequency dim → TakeOrderedAndProject. Candidate
    volume is Σ_doc (distinct_tokens choose 2): bounded by the vocabulary,
    not document length — a production corpus first prunes to the top-V
    vocabulary (V ~ 10⁵), keeping the pair space ≤ V², and the support
    floor keeps the aggregate output small. No driver-side loop; the
    doc-count normalizer is a scalar broadcast cross join inside the plan."""
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("t"),
        )
        .filter(F.col("t") != "")
        .distinct()
    )
    tok = dt.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n = dt.agg(F.countDistinct("doc_id").alias("n_docs"))
    a, b = dt.alias("a"), dt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(
            F.col("a.t").alias("token_a"), F.col("b.t").alias("token_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= _MIN_PAIR_DOCS)
    )
    ta = tok.select(F.col("t").alias("token_a"), F.col("c").alias("docs_a"))
    tb = tok.select(F.col("t").alias("token_b"), F.col("c").alias("docs_b"))
    lift = (F.col("pair_docs") * F.col("n_docs")).cast("double") / (
        F.col("docs_a") * F.col("docs_b")
    ).cast("double")
    return (
        pairs.join(F.broadcast(ta), "token_a")
        .join(F.broadcast(tb), "token_b")
        .crossJoin(F.broadcast(n))
        .select(
            "token_a",
            "token_b",
            "pair_docs",
            "docs_a",
            "docs_b",
            lift.alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(), F.col("token_a").asc(), F.col("token_b").asc()
        )
        .limit(_TOP_PAIRS)
    )
