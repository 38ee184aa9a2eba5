"""Invariant tests for the corpus-novelty / layout batch: n-gram novelty,
source TV skew, BPE first merges, split leakage, and the Z-order layout
grader. The DuckDB oracles pin cross-engine value equality; these pin the
SEMANTIC properties the oracles can't express."""

import pytest
from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.operators.diagnostics import (
    _Z_DIM,
    _morton_sql,
)
from cdmx_airquality_etl_spark.registry import QUERIES
from cdmx_airquality_etl_spark.sources.parquet import load_table


def test_ngram_novelty_invariants(spark, sf_dir):
    rows = QUERIES["q_ngram_novelty"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"], r
        assert r["novelty_rate"] == pytest.approx(r["n_novel"] / r["n_grams"])
    # every distinct gram's first occurrence is novel for exactly one doc,
    # so summed novel grams == corpus-wide distinct gram count
    from cdmx_airquality_etl_spark.operators.corpus_novelty import (
        _doc_gram_fps,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        _doc_gram_fps(docs, "doc_id").select("fp").distinct().count()
    )
    assert sum(r["n_novel"] for r in rows) == n_distinct


def test_source_skew_tv_is_a_distance(spark, sf_dir):
    rows = QUERIES["q_source_skew_tv"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["tv_distance"] <= 1.0, r
        assert r["n_vocab"] <= r["n_tokens"]
    # a single-source corpus would have distance 0; the synthetic mixed
    # corpus must show nonzero skew somewhere
    assert any(r["tv_distance"] > 0.0 for r in rows)


def test_bpe_first_merges_ordering(spark, sf_dir):
    rows = QUERIES["q_bpe_first_merges"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r["pair"]) == 2


def test_split_leakage_consistent_with_split(spark, sf_dir):
    rows = QUERIES["q_split_leakage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_leaked_docs"] <= r["n_eval_docs"], r
        assert r["n_shared_grams"] <= r["n_eval_grams"], r
        assert r["gram_leak_rate"] == pytest.approx(
            r["n_shared_grams"] / r["n_eval_grams"]
        )
    # eval doc counts must agree with the split rule itself (only docs
    # with >= 5 tokens carry grams)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    bucket = (
        F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
        % 10
    )
    n_eval_with_grams = (
        docs.filter(bucket >= 8)
        .filter(
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= 5
        )
        .count()
    )
    assert sum(r["n_eval_docs"] for r in rows) == n_eval_with_grams


def test_morton_code_is_bijective_on_small_domain(spark):
    # every (x, y) in a 16x16 tile maps to a distinct code < 256
    df = spark.range(256).select(
        (F.col("id") % 16).alias("xx"), (F.col("id") / 16).cast("long").alias("yy")
    )
    codes = [
        r["m"]
        for r in df.select(
            F.expr(_morton_sql("xx", "yy", "DIV")).alias("m")
        ).collect()
    ]
    assert sorted(codes) == list(range(256))


def _zorder_rows(spark, d):
    return {
        r["layout"]: r for r in QUERIES["q_zorder_layout"](spark, d).collect()
    }


def test_zorder_layout_soundness(spark, sf_dir):
    rows = _zorder_rows(spark, sf_dir)
    assert set(rows) == {"zorder", "linear"}
    z, l = rows["zorder"], rows["linear"]
    assert z["n_rows"] == l["n_rows"]
    # z-order never reads MORE files than linear for the key-slice probe
    # (at sf0.001 the probe lies above the tiny custkey domain and both
    # layouts keep zero files — the strict win is asserted at sf0.01)
    assert z["keep_rate"] <= l["keep_rate"]
    for r in (z, l):
        assert 0 <= r["n_files_kept"] <= r["n_files"]
    assert _Z_DIM == 4096


def test_zorder_layout_beats_linear_at_density(spark):
    # sf0.01's custkey domain (1..1499) covers the probe slice, so the
    # 2-D tiling must show a real prune win over the date-linear layout
    rows = _zorder_rows(spark, "/root/testdata/sf0.01")
    z, l = rows["zorder"], rows["linear"]
    assert z["keep_rate"] < l["keep_rate"]
    assert z["n_files_kept"] > 0  # probe is populated — pruning, not absence


def test_pca_top_component_dominates_variances(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.vector_stats import (
        _PCA_DIMS,
        _pca_cov_from_stats,
        _pca_power,
        _pca_train_spark,
    )

    rows = QUERIES["q_pca_top_component"](spark, sf_dir).collect()
    assert rows
    lam = rows[0]["eigenvalue"]
    ratio = rows[0]["explained_ratio"]
    assert all(r["eigenvalue"] == lam for r in rows)  # constant audit cols
    assert 0.0 < ratio <= 1.0 + 1e-12
    # Rayleigh-quotient maximality: the top eigenvalue dominates every
    # coordinate variance (C_ii is the quotient of the i-th basis vector)
    c = _pca_cov_from_stats(_pca_train_spark(spark, sf_dir))
    assert lam >= max(c[i][i] for i in range(_PCA_DIMS)) - 1e-12
    # unit-norm loadings out of the shared iteration
    v, lam2, _ = _pca_power(c)
    assert lam2 == lam
    assert sum(x * x for x in v) == pytest.approx(1.0)


def test_mrr_eval_rank_consistency(spark, sf_dir):
    # the count-based rank must equal the row_number rank of the first
    # same-label neighbor under the pinned (cosine DESC, vec_id ASC) order
    from pyspark.sql.window import Window

    rows = QUERIES["q_mrr_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["first_hit_rank"] >= 1
        assert r["reciprocal_rank"] == pytest.approx(
            1.0 / r["first_hit_rank"]
        )
    from cdmx_airquality_etl_spark.operators.similarity import (
        _BATCH_QUERIES,
        _dot,
        _nonzero,
        _norm,
    )

    emb = _nonzero(load_table(spark, sf_dir, "embeddings"))
    qs = emb.filter(F.col("vec_id") < _BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_nrm"),
    )
    corpus = emb.filter(F.col("vec_id") >= _BATCH_QUERIES).select(
        "vec_id", "label", "embedding", _norm("embedding").alias("nrm")
    )
    cos = _dot("embedding", "q_emb") / (F.col("nrm") * F.col("q_nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id").asc()
    )
    ranked = (
        corpus.join(F.broadcast(qs))
        .select("query_id", "q_label", "vec_id", "label", cos.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("label") == F.col("q_label"))
        .groupBy("query_id")
        .agg(F.min("rn").alias("rank_by_sort"))
    )
    by_sort = {r["query_id"]: r["rank_by_sort"] for r in ranked.collect()}
    for r in rows:
        assert by_sort[r["query_id"]] == r["first_hit_rank"], r
