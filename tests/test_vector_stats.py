"""Semantics tests for the vector-statistics batch
(operators/vector_stats.py), replayed with numpy over the same quantized
fixed-point values."""

import math

import numpy as np
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.vector_stats import _COV_DIMS, _NORM_BIN, _Q
from cdmx_airquality_etl_spark.registry import QUERIES


def _emb(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np.stack([np.asarray(e, dtype=np.float32) for e in t["embedding"]])
    return t, mat


def _quant(mat):
    return np.floor(mat.astype(np.float64) * _Q).astype(np.int64)


# ---------------------------------------------------------------------------
# q_feature_moments
# ---------------------------------------------------------------------------
def test_feature_moments_matches_numpy(spark, sf_dir):
    rows = {r["dim"]: r for r in QUERIES["q_feature_moments"](spark, sf_dir).collect()}
    _, mat = _emb(sf_dir)
    w = _quant(mat)
    n = w.shape[0]
    assert len(rows) == mat.shape[1]
    for d in range(mat.shape[1]):
        r = rows[d]
        assert r["n"] == n
        assert abs(r["mean"] - w[:, d].sum() / (n * _Q)) < 1e-12
        var = (n * (w[:, d].astype(object) ** 2).sum() - int(w[:, d].sum()) ** 2) / (
            n * n * _Q * _Q
        )
        assert abs(r["variance"] - var) < 1e-9
        assert r["min_q"] == w[:, d].min() / _Q
        assert r["max_q"] == w[:, d].max() / _Q


# ---------------------------------------------------------------------------
# q_label_centroids
# ---------------------------------------------------------------------------
def test_label_centroids_match_numpy(spark, sf_dir):
    rows = {(r["label"], r["dim"]): r for r in QUERIES["q_label_centroids"](spark, sf_dir).collect()}
    t, mat = _emb(sf_dir)
    w = _quant(mat)
    labels = t["label"].to_numpy()
    for lab in np.unique(labels):
        sub = w[labels == lab]
        for d in range(0, mat.shape[1], 16):
            r = rows[(lab, d)]
            assert r["n"] == len(sub)
            assert abs(r["centroid"] - sub[:, d].sum() / (len(sub) * _Q)) < 1e-12


# ---------------------------------------------------------------------------
# q_dim_covariance
# ---------------------------------------------------------------------------
def test_dim_covariance_diagonal_is_variance(spark, sf_dir):
    cov = {(r["dim_i"], r["dim_j"]): r["cov"] for r in QUERIES["q_dim_covariance"](spark, sf_dir).collect()}
    var = {r["dim"]: r["variance"] for r in QUERIES["q_feature_moments"](spark, sf_dir).collect()}
    assert len(cov) == _COV_DIMS * (_COV_DIMS + 1) // 2
    for d in range(_COV_DIMS):
        assert abs(cov[(d, d)] - var[d]) < 1e-12


def test_dim_covariance_cauchy_schwarz(spark, sf_dir):
    cov = {(r["dim_i"], r["dim_j"]): r["cov"] for r in QUERIES["q_dim_covariance"](spark, sf_dir).collect()}
    for (i, j), c in cov.items():
        if i != j:
            assert c * c <= cov[(i, i)] * cov[(j, j)] * (1 + 1e-9)


# ---------------------------------------------------------------------------
# q_norm_histogram
# ---------------------------------------------------------------------------
def test_norm_histogram_covers_all_vectors(spark, sf_dir):
    rows = QUERIES["q_norm_histogram"](spark, sf_dir).collect()
    t, mat = _emb(sf_dir)
    sq = np.einsum("ij,ij->i", mat.astype(np.float64), mat.astype(np.float64))
    finite = sq[np.isfinite(sq) & (sq > 0)]
    assert sum(r["n_vectors"] for r in rows) == len(finite)
    for r in rows:
        assert r["min_sq_norm"] >= r["bin"] * _NORM_BIN
        assert r["max_sq_norm"] < (r["bin"] + 1) * _NORM_BIN


# ---------------------------------------------------------------------------
# q_centroid_confusion
# ---------------------------------------------------------------------------
def test_centroid_confusion_totals_and_accuracy(spark, sf_dir):
    rows = QUERIES["q_centroid_confusion"](spark, sf_dir).collect()
    t, mat = _emb(sf_dir)
    total = sum(r["n"] for r in rows)
    assert total == len(t)  # corpus has no degenerate vectors
    # the exact-centroid classifier must beat chance on a 10-class corpus
    correct = sum(r["n"] for r in rows if r["true_label"] == r["assigned_label"])
    n_labels = t["label"].nunique()
    assert correct / total > 1.0 / n_labels


def test_centroid_confusion_matches_numpy_argmax(spark, sf_dir):
    rows = {(r["true_label"], r["assigned_label"]): r["n"] for r in QUERIES["q_centroid_confusion"](spark, sf_dir).collect()}
    t, mat = _emb(sf_dir)
    w = _quant(mat)
    labels = t["label"].to_numpy()
    labs = np.unique(labels)
    cents = np.stack([w[labels == l].sum(axis=0) / (np.sum(labels == l) * _Q) for l in labs])
    # replicate the ordered-fold dot: numpy dot on float64 agrees to 1e-9
    dots = mat.astype(np.float64) @ cents.T
    assigned = labs[np.argmax(dots, axis=1)]
    got = {}
    for tl, al in zip(labels, assigned):
        got[(tl, al)] = got.get((tl, al), 0) + 1
    # allow tiny argmax tie divergence (none expected on this corpus)
    assert sum(rows.values()) == sum(got.values())
    mismatched = sum(
        abs(rows.get(k, 0) - got.get(k, 0)) for k in set(rows) | set(got)
    )
    assert mismatched == 0
