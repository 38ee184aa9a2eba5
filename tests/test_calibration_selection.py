"""Semantics tests for q_isotonic_calibration (exact PAV via max-min) and
q_dsir_weights, q_lsh_planner and q_lift_curve, with pure-Python replays."""

import hashlib

import pytest

import pandas as pd
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.llm_ops import (
    _DSIR_BUCKETS,
    _DSIR_TARGET_LANG,
)
from cdmx_airquality_etl_spark.registry import QUERIES


# ---------------------------------------------------------------------------
# q_isotonic_calibration
# ---------------------------------------------------------------------------
def _pav(bins):
    """Classic stack-based pool-adjacent-violators over (n, pos) bins in
    band order — the independent formulation the max-min identity must
    reproduce."""
    stack = []  # (n, pos, n_bins_pooled)
    for n, pos in bins:
        stack.append((n, pos, 1))
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):  # mean(prev) >= mean(last), exact in integers
            n2, p2, k2 = stack.pop()
            n1, p1, k1 = stack.pop()
            stack.append((n1 + n2, p1 + p2, k1 + k2))
    vals = []
    for n, pos, k in stack:
        vals.extend([pos / n] * k)
    return vals


def test_isotonic_matches_stack_pav_and_is_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["q_isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["band"],
    )
    assert rows
    bins = [(r["n_docs"], r["n_pass"]) for r in rows]
    ref = _pav(bins)
    for r, v in zip(rows, ref):
        assert abs(r["iso_rate"] - v) < 1e-12
        assert abs(r["raw_rate"] - r["n_pass"] / r["n_docs"]) < 1e-15
    # isotonic: non-decreasing in band
    for a, b in zip(rows, rows[1:]):
        assert a["iso_rate"] <= b["iso_rate"] + 1e-15
    # PAV preserves the weighted mean (mass conservation)
    tot_iso = sum(r["n_docs"] * r["iso_rate"] for r in rows)
    tot_pass = sum(r["n_pass"] for r in rows)
    assert abs(tot_iso - tot_pass) < 1e-6
    # and is a projection: bands already monotone in raw_rate are untouched
    if all(a["raw_rate"] <= b["raw_rate"] for a, b in zip(rows, rows[1:])):
        for r in rows:
            assert abs(r["iso_rate"] - r["raw_rate"]) < 1e-12


# ---------------------------------------------------------------------------
# q_dsir_weights
# ---------------------------------------------------------------------------
def _md5_bucket(tok):
    return int(hashlib.md5(f"dsir|{tok}".encode()).hexdigest()[:12], 16) % (
        _DSIR_BUCKETS
    )


def test_dsir_matches_python_replay(spark, sf_dir):
    rows = {
        r["doc_id"]: r for r in QUERIES["q_dsir_weights"](spark, sf_dir).collect()
    }
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    docs = docs[docs.text.notna()]
    feats = {}  # doc_id -> {f: c}
    langs = {}
    raw, tgt = {}, {}
    nr = nt = 0
    for d in docs.itertuples():
        toks = [t for t in d.text.lower().strip().split() if t]
        if not toks:
            continue
        langs[d.doc_id] = d.lang
        fc = feats.setdefault(d.doc_id, {})
        for t in toks:
            f = _md5_bucket(t)
            fc[f] = fc.get(f, 0) + 1
            raw[f] = raw.get(f, 0) + 1
            nr += 1
            if d.lang == _DSIR_TARGET_LANG:
                tgt[f] = tgt.get(f, 0) + 1
                nt += 1
    assert set(rows) == set(feats)
    B = _DSIR_BUCKETS
    for doc_id, fc in feats.items():
        score = 0.0
        for f in sorted(fc):
            rho = (
                float(tgt.get(f, 0) + 1)
                * (nr + B)
                / (float(raw[f] + 1) * (nt + B))
            )
            score += fc[f] * (rho - 1.0)
        r = rows[doc_id]
        assert r["lang"] == langs[doc_id] or (
            r["lang"] is None and pd.isna(langs[doc_id])
        )
        assert r["n_toks"] == sum(fc.values())
        assert abs(r["dsir_score"] - score) < 1e-9


def test_dsir_target_language_scores_higher(spark, sf_dir):
    rows = QUERIES["q_dsir_weights"](spark, sf_dir).collect()
    en = [r["dsir_score"] / r["n_toks"] for r in rows if r["lang"] == "en"]
    other = [
        r["dsir_score"] / r["n_toks"]
        for r in rows
        if r["lang"] is not None and r["lang"] != "en"
    ]
    assert en and other
    # the selection signal: target-domain docs rank above the rest on average
    assert sum(en) / len(en) > sum(other) / len(other)


# ---------------------------------------------------------------------------
# q_lsh_planner
# ---------------------------------------------------------------------------
def test_lsh_planner_s_curve_tradeoffs(spark, sf_dir):
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in QUERIES["q_lsh_planner"](spark, sf_dir).collect()
    }
    assert set(rows) == {(64, 2), (32, 4), (16, 8), (8, 16)}
    counts = {(r["n_dup_pairs"], r["n_near_pairs"]) for r in rows.values()}
    assert len(counts) == 1  # same observed pairs under every config
    n_dup, n_near = counts.pop()
    assert n_dup > 0
    by_bands = [rows[k] for k in sorted(rows, reverse=True)]  # 64 -> 8 bands
    for r in by_bands:
        if r["exp_recall"] is not None:
            assert 0.0 <= r["exp_recall"] <= 1.0
        if r["exp_fp_rate"] is not None:
            assert 0.0 <= r["exp_fp_rate"] <= 1.0
        if n_dup and n_near:
            # dups are likelier to be caught than near-misses everywhere
            assert r["exp_recall"] >= r["exp_fp_rate"]
    # more, shorter bands -> strictly easier to match: recall and fp both
    # decrease monotonically as bands shrink (r grows)
    for a, b in zip(by_bands, by_bands[1:]):
        assert a["exp_recall"] >= b["exp_recall"] - 1e-12
        if n_near:
            assert a["exp_fp_rate"] >= b["exp_fp_rate"] - 1e-12


# ---------------------------------------------------------------------------
# q_lift_curve
# ---------------------------------------------------------------------------
def test_lift_curve_reconciles_with_reliability(spark, sf_dir):
    rows = sorted(
        QUERIES["q_lift_curve"](spark, sf_dir).collect(),
        key=lambda r: -r["threshold_band"],
    )
    assert rows
    # cumulative counts grow monotonically to the full corpus
    for a, b in zip(rows, rows[1:]):
        assert a["cum_docs"] <= b["cum_docs"]
        assert a["cum_pass"] <= b["cum_pass"]
    last = rows[-1]
    assert last["depth"] == 1.0 and last["capture_rate"] == 1.0
    assert last["lift"] == 1.0  # full depth is the base rate
    # lift * base_rate * cum_docs == cum_pass (definition reconciliation)
    base = last["cum_pass"] / last["cum_docs"]
    for r in rows:
        assert r["lift"] * base * r["cum_docs"] == pytest.approx(
            r["cum_pass"], rel=1e-12
        )
        assert r["capture_rate"] >= r["depth"] - 1e-12 or r["lift"] < 1.0


# ---------------------------------------------------------------------------
# q_selection_parity
# ---------------------------------------------------------------------------
def test_selection_parity_invariants(spark, sf_dir):
    rows = QUERIES["q_selection_parity"](spark, sf_dir).collect()
    assert rows
    top = max(r["sel_rate"] for r in rows)
    n_top = sum(1 for r in rows if r["impact_ratio"] == 1.0)
    assert n_top >= 1  # the reference group scores ratio exactly 1
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_docs"]
        assert r["sel_rate"] == r["n_selected"] / r["n_docs"]
        assert r["impact_ratio"] == r["sel_rate"] / top
        assert r["flagged"] == (1 if r["impact_ratio"] < 0.8 else 0)


# ---------------------------------------------------------------------------
# q_eb_shrinkage
# ---------------------------------------------------------------------------
def test_eb_shrinkage_pulls_toward_grand_mean(spark, sf_dir):
    rows = QUERIES["q_eb_shrinkage"](spark, sf_dir).collect()
    assert rows
    tk = sum(r["n_pass"] for r in rows)
    tn = sum(r["n_docs"] for r in rows)
    pbar = tk / tn
    for r in rows:
        assert 0.0 <= r["shrink_weight"] <= 1.0
        assert r["raw_rate"] == r["n_pass"] / r["n_docs"]
        # the shrunk rate sits between the raw rate and the grand mean
        lo, hi = sorted((r["raw_rate"], pbar))
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12
        # definition reconciles
        assert r["shrunk_rate"] == pytest.approx(
            pbar + r["shrink_weight"] * (r["raw_rate"] - pbar), rel=1e-12
        )
    # shrinkage is stronger (weight smaller) for smaller sources
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    for a, b in zip(by_n, by_n[1:]):
        assert a["shrink_weight"] <= b["shrink_weight"] + 1e-12


# ---------------------------------------------------------------------------
# q_err_eval
# ---------------------------------------------------------------------------
def test_err_eval_matches_cascade_replay(spark, sf_dir):
    row = QUERIES["q_err_eval"](spark, sf_dir).collect()[0]
    ndcg = QUERIES["q_ndcg"](spark, sf_dir).collect()[0]
    assert 0.0 <= row["err"] <= 1.0
    if row["n_rel_topk"] == 0:
        assert row["err"] == 0.0 and row["first_rel_rank"] is None
        return
    # cascade replay from the MRR-style facts: ERR is bounded above by
    # 1/2 / first_rel_rank + the geometric tail
    assert row["first_rel_rank"] >= 1
    first_term = 0.5 / row["first_rel_rank"]
    assert row["err"] >= first_term - 1e-15
    tail = sum(
        (0.5**j) / row["first_rel_rank"] for j in range(1, row["n_rel_topk"] + 1)
    )
    assert row["err"] <= tail + 1e-12
    # ERR and NDCG grade the same ranking: both zero or both positive
    assert (row["err"] > 0) == (ndcg["dcg"] > 0)


def test_pav_maxmin_identity_hypothesis():
    """The max-min representation q_isotonic_calibration evaluates must
    equal stack-based PAV on arbitrary bins — the algebraic identity the
    Spark expression relies on, checked exhaustively-ish."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    bins_st = st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=200, deadline=None)
    @given(bins_st)
    def check(bins):
        ref = _pav(bins)
        n = len(bins)
        cn = [0]
        cp = [0]
        for nn, pp in bins:
            cn.append(cn[-1] + nn)
            cp.append(cp[-1] + pp)
        for i in range(n):
            got = max(
                min(
                    (cp[k + 1] - cp[j]) / (cn[k + 1] - cn[j])
                    for k in range(i, n)
                )
                for j in range(0, i + 1)
            )
            assert abs(got - ref[i]) < 1e-12

    check()
