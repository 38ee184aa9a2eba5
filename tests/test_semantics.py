"""Semantics tests for the SQL-corner batch (operators/semantics.py)."""

import pandas as pd
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.semantics import _ROLL_DAYS
from cdmx_airquality_etl_spark.registry import QUERIES


def test_null_ordering_relationship(spark, sf_dir):
    rows = QUERIES["q_null_ordering"](spark, sf_dir).collect()
    n_null = sum(1 for r in rows if r["price_n"] is None)
    assert n_null > 0
    for r in rows:
        if r["price_n"] is None:
            # NULLS FIRST puts them at the head; NULLS LAST at the tail
            assert r["rn_nf"] <= n_null
            assert r["rn_nl"] > len(rows) - n_null
        else:
            # non-null rows shift by exactly the NULL count
            assert r["rn_nf"] == r["rn_nl"] + n_null


def test_division_identity_and_python_divergence(spark, sf_dir):
    rows = QUERIES["q_division_semantics"](spark, sf_dir).collect()
    assert any(r["a"] < 0 for r in rows)
    diverged = 0
    for r in rows:
        a, b = r["a"], r["b"]
        # engine identity: truncating division + dividend-sign remainder
        assert a == r["div_trunc"] * b + r["mod_signed"]
        assert 0 <= r["mod_positive"] < b
        assert (r["mod_positive"] - r["mod_signed"]) % b == 0
        # Python's floor semantics differ on negative non-exact quotients
        if a < 0 and a % b != 0:
            assert a // b != r["div_trunc"]
            diverged += 1
    assert diverged > 0, "the corpus must exercise the Python-divergent corner"


def test_empty_agg_one_row_null_values(spark, sf_dir):
    rows = QUERIES["q_empty_agg"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rows"] == 0 and r["n_vals"] == 0
    assert r["sum_price"] is None and r["min_price"] is None and r["max_price"] is None


def test_distinct_nulls_counters_diverge(spark, sf_dir):
    rows = {r["pri_key"]: r for r in QUERIES["q_distinct_nulls"](spark, sf_dir).collect()}
    assert "<NULL>" in rows
    nul = rows["<NULL>"]
    assert nul["n_rows"] > 0
    assert nul["n_nonnull"] == 0  # COUNT(col) skips NULLs
    for key, r in rows.items():
        if key != "<NULL>":
            assert r["n_rows"] == r["n_nonnull"]


def test_rolling_distinct_matches_pandas(spark, sf_dir):
    rows = {r["day"]: r["users_7d"] for r in QUERIES["q_rolling_distinct"](spark, sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["day"] = (pd.to_datetime(ev["ts"]).dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    days = sorted(ev["day"].unique())
    for d in days:
        win = ev[(ev.day >= d - (_ROLL_DAYS - 1)) & (ev.day <= d)]
        assert rows[d] == win["user_id"].nunique()
    # rolling count dominates the daily count
    for d in days:
        assert rows[d] >= ev.loc[ev.day == d, "user_id"].nunique()
