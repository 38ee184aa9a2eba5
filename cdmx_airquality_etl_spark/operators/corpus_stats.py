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


# ---------------------------------------------------------------------------
# q_heavy_hitters — two-pass exact frequent tokens: Misra-Gries candidate
# sketch per partition, then exact verification of candidates only
# ---------------------------------------------------------------------------
_MG_COUNTERS = 64  # per-partition counter budget
_HH_PCT = 3  # report tokens with > _HH_PCT% of all token occurrences


def _mg_candidates(iter_batches):
    """Misra-Gries with _MG_COUNTERS counters over one partition's token
    stream (classic streaming heavy-hitters sketch, Misra & Gries 1982 —
    public algorithm). Guarantee used below: any token with partition
    frequency > N_p/k survives in the final counters; summed over
    partitions, every token with GLOBAL frequency > N/k is emitted by at
    least one partition — a strict superset of the > _HH_PCT% answer
    because _HH_PCT/100 > 1/k."""
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in iter_batches:
        for t in pdf["token"]:
            if t in counters:
                counters[t] += 1
            elif len(counters) < _MG_COUNTERS:
                counters[t] = 1
            else:
                for key in list(counters):
                    counters[key] -= 1
                    if counters[key] == 0:
                        del counters[key]
    yield pd.DataFrame({"token": list(counters)})


@register(
    "q_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS}) AS token FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS cnt FROM tok WHERE token <> ''
      GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM counts)
    SELECT token, cnt,
           CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
    FROM counts, tot
    WHERE cnt * 100 > n_total * {_HH_PCT}
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (> {_HH_PCT}% of token occurrences) via the
    two-pass sketch-then-verify plan: pass 1 runs a Misra-Gries sketch
    independently inside each partition (mapInPandas, bounded at
    _MG_COUNTERS counters — O(k) memory per task, no shuffle), pass 2
    exactly counts ONLY the surviving candidates (broadcast semi-join →
    hash aggregate) and applies the integer-exact threshold
    cnt·100 > N·{_HH_PCT}.

    Why not just groupBy? At 100 TB a full token groupBy shuffles
    |vocabulary| keys; the sketch bounds pass-1 output at
    k × partitions rows regardless of vocabulary, and pass 2 shuffles
    only candidate traffic. The MG guarantee (any token above N/k
    globally survives some partition's counters, k = {_MG_COUNTERS} >
    100/{_HH_PCT}) makes the candidate set a strict superset, so the
    verified output is EXACT — the oracle is the plain one-pass answer.
    The sketch is Arrow-batched Python; counts never leave the JVM."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    ).filter(F.col("token") != "")
    candidates = (
        tok.mapInPandas(_mg_candidates, "token string").distinct()
    )
    verified = (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        verified.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 100 > F.col("n_total") * _HH_PCT)
        .select(
            "token",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_bigram_lm — bigram language-model scoring, integer-exact like the
# unigram twin (corpus_quality.q_unigram_lm)
# ---------------------------------------------------------------------------
@register(
    "q_bigram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKS} AS ts FROM documents
      WHERE text IS NOT NULL AND len({_TOKS}) >= 2
    ),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(ts)),
                    i -> ts[i] || ' ' || ts[i + 1])) AS bigram
      FROM toks
    ),
    counts AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
    uni AS (
      SELECT COUNT(DISTINCT t) AS v_vocab
      FROM (SELECT unnest(ts) AS t FROM toks)
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_bigrams FROM counts
    ),
    per_doc AS (
      SELECT doc_id, lang, COUNT(*) AS n_bg,
             CAST(SUM(c + 1) AS BIGINT) AS s
      FROM bg JOIN counts USING (bigram)
      GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_bg,
           s / (n_bg * (n_bigrams + v_vocab * v_vocab)) AS avg_prob
    FROM per_doc, tot, uni
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring: train joint bigram counts on the corpus,
    score each document by its mean add-one-smoothed bigram probability
    mean_b (c_b + 1) / (N₂ + V²) — the second-order twin of q_unigram_lm
    that separates coherent word ORDER from unigram-frequency soup
    (documents scoring high on unigrams but low here are bag-of-frequent-
    words spam).

    Same exactness design as the unigram: avg_prob =
    Σ(c_b + 1) / (n_bg · (N₂ + V²)) with BIGINT numerator and denominator
    and ONE final double division — no per-bigram float sum whose order
    could differ between engines, no log-space (engine libm logs differ in
    the last ulp). Bigram extraction is a native zip of the token array
    with its own tail (no explode-then-self-join: that plan shuffles the
    corpus twice). Train + score is two hash aggregates and one join on
    the bigram string."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("ts"),
    ).filter(F.size("ts") >= 2)
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "zip_with(slice(ts, 1, size(ts) - 1), "
                "slice(ts, 2, size(ts) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    uni = toks.select(F.explode("ts").alias("t")).agg(
        F.countDistinct("t").alias("v_vocab")
    )
    tot = counts.agg(F.sum("c").cast("long").alias("n_bigrams"))
    per_doc = (
        bg.join(counts, "bigram")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bg"),
            F.sum(F.col("c") + 1).cast("long").alias("s"),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(uni))
        .select(
            "doc_id",
            "lang",
            "n_bg",
            (
                F.col("s")
                / (
                    F.col("n_bg")
                    * (F.col("n_bigrams") + F.col("v_vocab") * F.col("v_vocab"))
                )
            ).alias("avg_prob"),
        )
    )
