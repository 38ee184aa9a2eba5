"""UDF-surface operators (SURVEY.md §2B q_udf_normalize + multimodal entry).

These are the deliberately-Python operators: the exact-NFKD fold that native
expressions can't express (scrapper.py:20-26 semantics beyond the Latin
translate table) and the multimodal decode pipeline. Both are Arrow-batched —
the only Python in the engine's hot paths. No oracle (DuckDB has no NFKD
UDF), so the driver records rows-only checks, as SURVEY.md §7 declares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import normalize_text_col, normalize_text_nfkd
from ..registry import register
from ..sources.parquet import load_table


@register("q_udf_normalize")
def q_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NFKD accent-fold normalize (pandas UDF) next to the native
    translate-based fast path, with an agreement flag — the operator that
    proves the two implementations coincide on the corpus (they must: the
    corpus is ASCII; non-ASCII inputs are the UDF's reason to exist)."""
    docs = load_table(spark, sf_dir, "documents")
    native = normalize_text_col(F.col("text"))
    exact = normalize_text_nfkd(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        native.alias("norm_native"),
        exact.alias("norm_nfkd"),
        F.when(native == exact, 1).otherwise(0).alias("agree_int"),
    )


@register("q_multimodal_meta")
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing as a query: text → binary payload + metadata →
    Arrow-batched (stub) feature decode → per-source feature statistics.
    Exercises the full binary-column path end to end."""
    from ..multimodal import attach_binary, decode_media

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text", mime="text/plain")
    feats = decode_media(media, dim=8, fake=True)
    joined = feats.join(
        docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id"
    )
    return (
        joined.select("source", "n_bytes", F.element_at("feature", 1).alias("f0"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.sum("f0") / F.count(F.lit(1))).alias("avg_f0"),
        )
    )


@register("q_compression_ratio")
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal — the standard cheap proxy for
    repetitive/boilerplate text (very low ratio) and random noise (ratio
    near or above 1) used by large-corpus curation pipelines alongside the
    rule battery (q_gopher_rules) and model scores (q_unigram_lm,
    q_quality_classifier).

    Python is unavoidable (no DEFLATE in SQL expressions — also why this is
    a rows-only entry), so the operator demonstrates the engine's sanctioned
    slow path: ``mapInPandas`` with Arrow-batched transfer, per-batch work
    vectorized over the pandas block, zero shuffles — a pure scan-side map
    that scales embarrassingly. Level is pinned (6) so output is
    deterministic for a given zlib build."""
    docs = load_table(spark, sf_dir, "documents")

    def score(batches):
        import pandas as pd
        import zlib

        for pdf in batches:
            n_bytes, n_comp = [], []
            for t in pdf["text"]:
                if t is None:
                    n_bytes.append(None)
                    n_comp.append(None)
                else:
                    raw = t.encode("utf-8")
                    n_bytes.append(len(raw))
                    n_comp.append(len(zlib.compress(raw, 6)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "n_compressed": pd.array(n_comp, dtype="Int64"),
                }
            )
            out["ratio"] = out["n_compressed"] / out["n_bytes"]
            yield out

    return docs.select("doc_id", "lang", "text").mapInPandas(
        score,
        "doc_id long, lang string, n_bytes long, n_compressed long, ratio double",
    )
