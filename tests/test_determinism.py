"""Partition-layout invariance: the determinism-critical operators claim
their output is identical under re-runs AND under different parallelism
(content hashing, never rand(seed) / monotonically_increasing_id, whose
values depend on partition layout). Prove it: run each query under two
different shuffle-partition counts and require identical result multisets.
This is the property that makes a 100 TB re-run reproduce the same split /
sample / shuffle / signature byte-for-byte on a differently-sized cluster.
"""

import pytest

from cdmx_airquality_etl_spark.registry import QUERIES

# every operator whose docstring promises repartition/re-run stability
DETERMINISTIC_QUERIES = [
    "q_train_test_split",
    "q_stratified_sample",
    "q_global_shuffle",
    "q_token_shard",
    "q_pack_sequences",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_doc_fingerprint",
    "q_similarity_ann_lsh",
    # hashed-model scoring and anchor selection are content-derived (md5
    # weights / min-id anchors / exact int + single-divide arithmetic) —
    # the same guarantee their docstrings state
    "q_quality_classifier",
    "q_dedup_semantic",
    "q_tfidf_topterms",
    "q_chunk_documents",
    "q_cap_per_source",
    # round-3 additions: exact-integer scoring (unigram LM), single-division
    # ratios + sorted-run fold (gopher rules), tie-broken row_number over
    # IEEE-deterministic cosine (knn graph), pinned-level zlib (compression)
    "q_unigram_lm",
    "q_gopher_rules",
    "q_knn_graph",
    "q_compression_ratio",
]


def _rows(spark, name, sf_dir):
    return sorted(
        tuple(r) for r in QUERIES[name](spark, sf_dir).collect()
    )


@pytest.mark.parametrize("name", DETERMINISTIC_QUERIES)
def test_output_invariant_under_parallelism(spark, sf_dir, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _rows(spark, name, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert wide == narrow
