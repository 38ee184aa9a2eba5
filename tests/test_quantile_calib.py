"""Semantics tests for quantile calibration + tie semantics
(operators/quantile_calib.py)."""

import pandas as pd
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.quantile_calib import _STRIDE, _TIE_K
from cdmx_airquality_etl_spark.registry import QUERIES


def _orders(sf_dir):
    return pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()


def test_sample_quantile_error_matches_pandas(spark, sf_dir):
    rows = {r["o_orderpriority"]: r for r in QUERIES["q_sample_quantile_error"](spark, sf_dir).collect()}
    orders = _orders(sf_dir)
    for pri, g in orders.groupby("o_orderpriority"):
        r = rows[pri]
        full = g.sort_values(["o_totalprice", "o_orderkey"])
        assert r["n_full"] == len(full)
        assert r["exact_median"] == full["o_totalprice"].iloc[(len(full) + 1) // 2 - 1]
        samp = g[g.o_orderkey % _STRIDE == 0].sort_values(["o_totalprice", "o_orderkey"])
        assert r["n_sample"] == len(samp)
        assert r["est_median"] == samp["o_totalprice"].iloc[(len(samp) + 1) // 2 - 1]
        assert abs(r["abs_err"] - abs(r["est_median"] - r["exact_median"])) < 1e-9
        # a 5% stride sample should put the median in the right ballpark
        assert r["rel_err"] < 0.5


def test_topk_ties_ordering_invariant(spark, sf_dir):
    rows = QUERIES["q_topk_ties"](spark, sf_dir).collect()
    assert rows
    diverged = False
    for r in rows:
        assert r["kept_row_number"] == min(
            _TIE_K, r["kept_rank"]
        ) or r["kept_row_number"] == _TIE_K
        assert r["kept_row_number"] <= r["kept_rank"] <= r["kept_dense_rank"]
        diverged = diverged or (r["kept_rank"] != r["kept_row_number"])
    # the banded ordering must actually produce ties somewhere
    assert diverged or any(r["kept_dense_rank"] > r["kept_rank"] for r in rows)


def test_topk_ties_matches_pandas(spark, sf_dir):
    rows = {r["o_orderpriority"]: r for r in QUERIES["q_topk_ties"](spark, sf_dir).collect()}
    orders = _orders(sf_dir)
    orders["band"] = (orders["o_totalprice"] // 1000).astype("int64")
    for pri, g in orders.groupby("o_orderpriority"):
        bands = sorted(g["band"], reverse=True)
        r = rows[pri]
        assert r["kept_row_number"] == min(_TIE_K, len(bands))
        # rank <= K keeps all rows whose band ties into the top K positions
        kth_band = bands[_TIE_K - 1] if len(bands) >= _TIE_K else bands[-1]
        assert r["kept_rank"] == sum(1 for b in bands if b >= kth_band)
        top_bands = sorted(set(bands), reverse=True)[:_TIE_K]
        assert r["kept_dense_rank"] == sum(1 for b in bands if b in top_bands)
