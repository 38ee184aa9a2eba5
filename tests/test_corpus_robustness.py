"""Adversarial-corpus smoke: the driver regenerates /root/testdata between
rounds and its edge-content mix changes (NULL text appeared at sf0.1 in
round 2; the events encoding changed in round 3). Run EVERY corpus-table
operator over a synthesized documents/embeddings pair stuffed with the edge
cases a drifted generator could ship — NULL text, NULL lang/source, empty
and whitespace-only strings, single-token docs, unicode, one giant doc —
and require each to produce a result (no exception, deterministic count on
a repeat run). Catches "operator crashes on data shape X" before a driver
regeneration does."""

import pytest

from cdmx_airquality_etl_spark.registry import QUERIES

CORPUS_MODULES = {
    "textstats",
    "corpus_novelty",
    "llm_ops",
    "corpus_quality",
    "corpus_stats",
    "dedup",
    "similarity",
    "pipeline_ops",
    "udf_surface",
    "clustering",
    "text_ext",
    "subdoc",
    "vector_stats",
    "graph_ext",
    "stats_tests",
    "rerank",
}

# members of the modules above that read the TPC-H/events tables, not the
# corpus pair
_NON_CORPUS = {
    "q_histogram",
    "q_profile_table",
    "q_shortest_path",
    "q_link_prediction",
    "q_degree_distribution",
    "q_ols_group",
    "q_chi_square",
    "q_ks_binned",
    "q_benford",
    "q_cramers_v",
    "q_bootstrap_ci",
    "q_pass_at_k",
    "q_permutation_test",
    "q_fdr_screen",
    "q_anova_oneway",
    "q_wilson_ci",
    "q_assortativity",
    "q_modularity",
}

CORPUS_QUERIES = sorted(
    name
    for name, fn in QUERIES.items()
    if fn.__module__.rsplit(".", 1)[-1] in CORPUS_MODULES
    and name not in _NON_CORPUS
)


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    rows = [
        (0, "the a quick brown fox jumps over the lazy dog again and again", "en", "src0", 62),
        (1, None, "en", "src1", None),  # NULL text
        (2, "", "es", "src2", 0),  # empty string
        (3, "   ", None, "src3", 3),  # whitespace only, NULL lang
        (4, "uno", "es", None, 3),  # single token, NULL source
        (5, "café naïve Zürich 北京 مرحبا", "zh", "src0", 26),  # unicode
        (6, "the " * 5000, "en", "src1", 20000),  # giant repetitive doc
        (7, "the a quick brown fox jumps over the lazy dog again and again", "en", "src4", 62),  # exact dup of 0
        (8, "a b", "fr", "src0", 3),
        (9, "x" * 400, "de", "src2", 400),  # one giant token
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    emb = [
        (i, [((i * 7 + j * 3) % 13 - 6) / 6.0 for j in range(64)], i % 3)
        for i in range(10)
    ]
    # one zero vector: cosine against it divides by a zero norm
    emb[9] = (9, [0.0] * 64, 0)
    # NaN / Inf components: dot(e,e) is NaN/Inf, which passes a bare > 0
    # filter in BOTH engines (NaN compares greater-than) and poisons top-k
    # ordering — the degenerate-vector guard must drop these rows
    emb[7] = (7, [float("nan")] + [0.5] * 63, 1)
    emb[8] = (8, [float("inf")] + [0.5] * 63, 2)
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", CORPUS_QUERIES)
def test_operator_survives_edge_corpus(spark, edge_dir, name):
    n1 = QUERIES[name](spark, edge_dir).count()
    assert n1 >= 0
    n2 = QUERIES[name](spark, edge_dir).count()
    assert n2 == n1, f"{name} row count not stable across re-runs"
