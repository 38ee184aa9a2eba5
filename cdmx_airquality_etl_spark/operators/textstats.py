"""Text-analysis operators over the ``documents`` table (north-star surface:
language-ID, quality scoring, token counting, document fingerprinting).

Lineage: all of these generalize the reference's text pipeline — F-NORM
normalization (/root/reference/scrapper.py:20-26), F-SPLIT tokenization
(:41), F-REPL stripping (:38) — from per-page pandas to distributed native
column expressions. Everything here is pure ``pyspark.sql.functions`` (no
Python UDFs): at 100 TB these run inside WholeStageCodegen with the parquet
scan pruned to (doc_id, text[, lang]).

Cross-engine parity notes (oracle = DuckDB): tokenization is
split-on-whitespace-runs after trim (identical in both), integer→double
division is IEEE-identical, and md5 is md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table

# Tiny stopword inventories for the heuristic language-ID (n-gram/stopword
# scoring). Deliberately small and hardcoded so the oracle SQL can repeat them
# verbatim.
_EN_STOP = ["the", "a", "of", "and", "to", "in", "is"]
_ES_STOP = ["el", "la", "de", "los", "y", "en", "es"]
_PUNCT_CLASS = "[.,;:!?]"


def _toks(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def _sql_toks(expr: str) -> str:
    return f"string_split_regex(trim(lower({expr})), '\\s+')"


def _hits(tokens: Column, stops: list[str]) -> Column:
    arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _sql_hits(toks_expr: str, stops: list[str]) -> str:
    lst = ", ".join(f"'{s}'" for s in stops)
    return f"len(list_filter({toks_expr}, t -> t IN ({lst})))"


# ---------------------------------------------------------------------------
# q_text_stats — corpus statistics per language
# ---------------------------------------------------------------------------
@register(
    "q_text_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len({_sql_toks('text')})) AS BIGINT) AS total_tokens,
           CAST(SUM(len({_sql_toks('text')})) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_toks(F.col("text")))
    return (
        docs.select("lang", "n_chars", n_tokens.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q_token_count — whitespace + BPE-ish regex token counts per document
# ---------------------------------------------------------------------------
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           len({_sql_toks('text')}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars_txt
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_toks(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_txt"),
    )


# ---------------------------------------------------------------------------
# q_lang_id — heuristic stopword-scoring language ID, evaluated against the
# labeled lang column
# ---------------------------------------------------------------------------
@register(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_sql_hits(_sql_toks('text'), _EN_STOP)} AS en_hits,
             {_sql_hits(_sql_toks('text'), _ES_STOP)} AS es_hits
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN en_hits > es_hits THEN 'en'
                WHEN es_hits > en_hits THEN 'es'
                ELSE 'unknown' END AS lang_pred,
           CASE WHEN lang = (CASE WHEN en_hits > es_hits THEN 'en'
                                  WHEN es_hits > en_hits THEN 'es'
                                  ELSE 'unknown' END)
                THEN 1 ELSE 0 END AS match_int
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        _hits(toks, _EN_STOP).alias("en_hits"),
        _hits(toks, _ES_STOP).alias("es_hits"),
    )
    pred = (
        F.when(F.col("en_hits") > F.col("es_hits"), "en")
        .when(F.col("es_hits") > F.col("en_hits"), "es")
        .otherwise("unknown")
    )
    return scored.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        F.when(F.col("lang") == pred, 1).otherwise(0).alias("match_int"),
    )


# ---------------------------------------------------------------------------
# q_quality_score — length/punctuation/stopword-ratio quality features
# ---------------------------------------------------------------------------
@register(
    "q_quality_score",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             len({_sql_toks('text')}) AS n_toks,
             {_sql_hits(_sql_toks('text'), _EN_STOP)} AS stop_hits,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_chars,
             length(text) AS n_chars_txt
      FROM documents
    )
    SELECT doc_id, n_toks,
           CAST(stop_hits AS DOUBLE) / n_toks AS stop_ratio,
           CAST(punct_chars AS DOUBLE) / n_chars_txt AS punct_ratio,
           0.5 * LEAST(CAST(n_toks AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (CAST(stop_hits AS DOUBLE) / n_toks)
             + 0.2 * (1.0 - CAST(punct_chars AS DOUBLE) / n_chars_txt) AS quality_score
    FROM feat
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    feat = docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        _hits(toks, _EN_STOP).alias("stop_hits"),
        F.length(F.regexp_replace("text", f"[^{_PUNCT_CLASS[1:-1]}]", "")).alias("punct_chars"),
        F.length("text").alias("n_chars_txt"),
    )
    stop_ratio = F.col("stop_hits").cast("double") / F.col("n_toks")
    punct_ratio = F.col("punct_chars").cast("double") / F.col("n_chars_txt")
    score = (
        F.lit(0.5) * F.least(F.col("n_toks").cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
    return feat.select(
        "doc_id",
        "n_toks",
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# q_doc_fingerprint — content fingerprints: md5 of the normalized text plus
# the minimum shingle hash (a 1-permutation MinHash, the building block the
# fuzzy-dedup banding generalizes)
# ---------------------------------------------------------------------------
@register(
    "q_doc_fingerprint",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm_text,
             string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id, norm_text,
             unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                   i -> array_to_string(w[i:i+2], ' '))) AS shingle
      FROM tok
    )
    SELECT doc_id,
           min(md5(norm_text)) AS fp_full,
           min(md5(shingle)) AS fp_min_shingle
    FROM sh
    GROUP BY doc_id
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    shingles = word_shingles(F.lower(F.col("text")), k=3)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_full"),
        F.array_min(F.transform(shingles, F.md5)).alias("fp_min_shingle"),
    )


# ---------------------------------------------------------------------------
# q_pii_scrub — PII redaction pass (emails, long digit runs)
# ---------------------------------------------------------------------------
# ASCII-only patterns chosen to mean the same thing in Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no \d shorthand-class surprises.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM_RE = r"[0-9]{7,}"


@register(
    "q_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
             '{_LONGNUM_RE}', '[NUM]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS BIGINT)
             AS n_longnums
    FROM documents
    WHERE doc_id < 200
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data pipeline runs
    before anything else: emails and 7+-digit runs (phone/account shaped)
    replaced with typed placeholder tokens, plus per-doc match counts for the
    scrub-rate report. Pure scalar regexp_replace/count inside one
    WholeStageCodegen projection — scan-side, no shuffle, trivially
    scan-parallel at 100 TB. Patterns are deliberately lookaround-free so
    Java regex and RE2 agree (generalizes F-REPL, scrapper.py:20-26)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"),
        _LONGNUM_RE,
        "[NUM]",
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_LONGNUM_RE)).cast("long").alias("n_longnums"),
    )
