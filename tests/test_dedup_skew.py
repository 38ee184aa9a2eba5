"""Skew fixture for the fuzzy-dedup postings cap: a stop-phrase shingle
shared by every document must not feed the candidate self-join once its
document frequency exceeds the cap (the quadratic failure mode at scale)."""

from cdmx_airquality_etl_spark.operators.dedup import _doc_shingles, _jaccard_pairs

N_DOCS = 40


def _skewed_docs(spark):
    # every doc: "a b c d{i}" → shingles {"a b c", "b c d{i}"}; "a b c" has
    # df = N_DOCS (hot), "b c d{i}" is unique per doc
    rows = [(i, f"a b c d{i}") for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_cap_prunes_hot_shingle(spark):
    sh = _doc_shingles(_skewed_docs(spark))
    # uncapped: every pair shares "a b c" → N·(N−1)/2 candidate pairs,
    # each with jaccard = 1/3
    uncapped = _jaccard_pairs(sh, threshold=0.2, max_postings=N_DOCS)
    assert uncapped.count() == N_DOCS * (N_DOCS - 1) // 2
    # capped below the hot shingle's df: the only shared shingle is dropped
    # from the postings, so the self-join produces zero candidates
    capped = _jaccard_pairs(sh, threshold=0.2, max_postings=10)
    assert capped.count() == 0


def test_postings_cap_never_creates_pairs(spark):
    # pruning is monotone: capped output ⊆ uncapped output
    sh = _doc_shingles(_skewed_docs(spark))
    uncapped = {
        (r.doc_id_a, r.doc_id_b)
        for r in _jaccard_pairs(sh, threshold=0.2, max_postings=N_DOCS).collect()
    }
    capped = {
        (r.doc_id_a, r.doc_id_b)
        for r in _jaccard_pairs(sh, threshold=0.2, max_postings=10).collect()
    }
    assert capped <= uncapped
