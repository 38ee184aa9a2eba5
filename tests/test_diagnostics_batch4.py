"""Semantics tests for the KMV distinct sketch and the CBO join-size
estimate diagnostic."""

import math

from cdmx_airquality_etl_spark.operators.diagnostics import _KMV_K
from cdmx_airquality_etl_spark.registry import QUERIES
from cdmx_airquality_etl_spark.sources.parquet import load_table


def test_kmv_estimate_quality(spark, sf_dir):
    rows = QUERIES["q_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] > 0
        if r["n_exact"] < _KMV_K:
            # sketch is exact below k (modulo 60-bit hash collisions: none
            # at these cardinalities)
            assert r["kmv_estimate"] == float(r["n_exact"])
        else:
            # KMV standard error is ~1/sqrt(k-2); allow 5 sigma
            rel = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
            assert rel < 5.0 / math.sqrt(_KMV_K - 2)


def test_join_cardinality_fk_exact(spark, sf_dir):
    row = QUERIES["q_join_cardinality"](spark, sf_dir).collect()[0]
    li_count = load_table(spark, sf_dir, "lineitem").count()
    # FK join: every lineitem matches exactly one order
    assert row["actual_rows"] == li_count
    # containment + uniformity hold exactly on clean FK data → q-error ~1
    assert math.isclose(row["q_error"], 1.0, rel_tol=1e-9)
    assert row["ndv_a"] >= row["ndv_b"]


def test_kmv_set_ops_estimates(spark, sf_dir):
    row = QUERIES["q_kmv_set_ops"](spark, sf_dir).collect()[0]
    assert 0 < row["exact_inter"] <= row["exact_union"]
    assert 0.0 <= row["jaccard_est"] <= 1.0
    sigma = 1.0 / math.sqrt(_KMV_K - 2)
    assert abs(row["union_est"] - row["exact_union"]) / row["exact_union"] < 5 * sigma
    # intersection estimate compounds union + jaccard error; allow wider
    assert abs(row["inter_est"] - row["exact_inter"]) / row["exact_union"] < 5 * sigma


def test_watermark_lateness_accounts_all_events(spark, sf_dir):
    from cdmx_airquality_etl_spark.sources.parquet import load_table as _lt

    rows = QUERIES["q_watermark_lateness"](spark, sf_dir).collect()
    total = _lt(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    by_bucket = {r["late_bucket_min"]: r["n_events"] for r in rows}
    assert all(b >= 0 for b in by_bucket)
    # on-time mass dominates under bounded jitter
    assert by_bucket[0] == max(by_bucket.values())
