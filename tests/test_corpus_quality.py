"""Unit tests for the corpus-quality operators (q_gopher_rules,
q_unigram_lm) and the bucketed k-NN graph (q_knn_graph) — laws that hold
for any corpus, checked on sf0.001."""

import math

from cdmx_airquality_etl_spark.operators.corpus_quality import (
    _MAX_MWL,
    _MAX_TOP_FRAC,
    _MAX_WORDS,
    _MIN_MWL,
    _MIN_WORDS,
    q_gopher_rules,
    q_unigram_lm,
)
from cdmx_airquality_etl_spark.operators.similarity import _KNN_K, q_knn_graph


def test_gopher_flags_consistent_with_metrics(spark, sf_dir):
    rows = q_gopher_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_words >= 1
        assert r.pass_len == int(_MIN_WORDS <= r.n_words <= _MAX_WORDS)
        assert r.pass_mwl == int(_MIN_MWL <= r.mean_word_len <= _MAX_MWL)
        assert r.pass_rep == int(r.top_word_frac <= _MAX_TOP_FRAC)
        assert r.pass_stop == int(r.stop_hits >= 1)
        assert r.pass_all == (
            r.pass_len & r.pass_mwl & r.pass_rep & r.pass_stop
        )
        # a word has ≥1 char; top word can't exceed all words
        assert r.mean_word_len >= 1.0
        assert 0.0 < r.top_word_frac <= 1.0
    # thresholds chosen to discriminate: both verdicts occur
    verdicts = {r.pass_all for r in rows}
    assert verdicts == {0, 1}


def test_gopher_metrics_match_python_recount(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(20)
        .collect()
        if r.text is not None
    }
    got = {
        r.doc_id: r
        for r in q_gopher_rules(spark, sf_dir).collect()
        if r.doc_id in docs
    }
    for doc_id, text in docs.items():
        toks = text.strip().lower().split()
        r = got[doc_id]
        assert r.n_words == len(toks)
        assert math.isclose(
            r.mean_word_len, sum(map(len, toks)) / len(toks), rel_tol=1e-12
        )
        top = max(toks.count(t) for t in set(toks))
        assert math.isclose(r.top_word_frac, top / len(toks), rel_tol=1e-12)


def test_unigram_lm_probability_laws(spark, sf_dir):
    rows = q_unigram_lm(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_toks >= 1
        assert 0.0 < r.avg_prob < 1.0
    # corpus-level identity: Σ_docs n_toks·avg_prob·(N+V) = Σ_docs Σ_t(c_t+1)
    # = Σ_tokens c_t + N = (Σ c²) + N summed over vocab — just check the
    # reconstruction is integral, which pins the exact-integer arithmetic
    docs = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if r.text is not None
    ]
    from collections import Counter

    counts = Counter(t for d in docs for t in d.strip().lower().split())
    n_corpus, v_vocab = sum(counts.values()), len(counts)
    for r in rows[:50]:
        s = r.avg_prob * r.n_toks * (n_corpus + v_vocab)
        assert math.isclose(s, round(s), abs_tol=1e-6), (r.doc_id, s)


def test_unigram_lm_matches_python_for_one_doc(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if r.text is not None
    }
    from collections import Counter

    counts = Counter(
        t for d in docs.values() for t in d.strip().lower().split()
    )
    n_corpus, v_vocab = sum(counts.values()), len(counts)
    got = {r.doc_id: r for r in q_unigram_lm(spark, sf_dir).collect()}
    for doc_id in list(docs)[:10]:
        toks = docs[doc_id].strip().lower().split()
        want = sum(counts[t] + 1 for t in toks) / (
            len(toks) * (n_corpus + v_vocab)
        )
        assert got[doc_id].avg_prob == want  # single division → bitwise


def test_knn_graph_rank_laws(spark, sf_dir):
    rows = q_knn_graph(spark, sf_dir).collect()
    assert rows
    by_vec = {}
    for r in rows:
        assert r.vec_id != r.neighbor_id
        assert 1 <= r.nn_rank <= _KNN_K
        assert -1.0 - 1e-9 <= r.cosine_sim <= 1.0 + 1e-9
        by_vec.setdefault(r.vec_id, []).append(r)
    for vec_id, nbrs in by_vec.items():
        ranks = sorted(n.nn_rank for n in nbrs)
        # ranks are 1..k' dense (k' ≤ K), neighbors distinct
        assert ranks == list(range(1, len(nbrs) + 1))
        assert len({n.neighbor_id for n in nbrs}) == len(nbrs)
        # ordered by cosine desc within the vector
        ordered = sorted(nbrs, key=lambda n: n.nn_rank)
        cosines = [n.cosine_sim for n in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_mixing_weights_reconstruct_target(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.corpus_quality import (
        _TARGET_MIX,
        q_mixing_weights,
    )

    rows = q_mixing_weights(spark, sf_dir).collect()
    assert {r.lang for r in rows} == {lang for lang, _ in _TARGET_MIX}
    total = sum(r.lang_toks for r in rows)
    for r in rows:
        assert math.isclose(r.actual_share, r.lang_toks / total, rel_tol=1e-12)
        assert r.weight > 0
        # applying the weight to the language's tokens yields exactly the
        # target share of the corpus
        assert math.isclose(
            r.weight * r.lang_toks / total, r.target_share, rel_tol=1e-12
        )
    assert math.isclose(sum(r.actual_share for r in rows), 1.0, rel_tol=1e-12)


def test_modal_join_partitions_corpus(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.corpus_quality import q_modal_join

    rows = q_modal_join(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs  # join is 1:1 on the key
    assert all(r.total_chars > 0 for r in rows)


def test_dup_source_matrix_totals_match_fuzzy_pairs(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.dedup import (
        q_dedup_fuzzy,
        q_dup_source_matrix,
    )

    n_pairs = q_dedup_fuzzy(spark, sf_dir).count()
    rows = q_dup_source_matrix(spark, sf_dir).collect()
    assert sum(r.n_dup_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b  # unordered pair canonicalization
