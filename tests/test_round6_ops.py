"""Invariant tests for the round-6 additions: Cohen's kappa, the int8
scalar-quantization audit, deterministic negative sampling, and the
language-ID confusion rollup. The DuckDB oracles pin cross-engine value
equality; these pin the SEMANTIC properties the oracles can't express."""

import pytest

from cdmx_airquality_etl_spark.registry import QUERIES


def test_kappa_consistent_with_confusion(spark, sf_dir):
    row = QUERIES["q_cohen_kappa"](spark, sf_dir).collect()[0]
    assert -1.0 <= row["kappa"] <= 1.0
    assert 0.0 <= row["po"] <= 1.0 and 0.0 <= row["pe"] <= 1.0
    conf = QUERIES["q_centroid_confusion"](spark, sf_dir).collect()
    n_total = sum(r["n"] for r in conf)
    n_agree = sum(r["n"] for r in conf if r["true_label"] == r["assigned_label"])
    assert row["n_total"] == n_total and row["n_agree"] == n_agree
    assert row["po"] == pytest.approx(n_agree / n_total)
    # kappa must exceed raw-accuracy-minus-chance reconstruction
    assert row["kappa"] == pytest.approx(
        (row["po"] - row["pe"]) / (1.0 - row["pe"])
    )


def test_scalar_quantization_error_bounds(spark, sf_dir):
    rows = QUERIES["q_scalar_quantization"](spark, sf_dir).collect()
    assert rows, "no dimensions audited"
    for r in rows:
        # floor quantizer: dequant error is strictly below one code width
        code_width = r["value_range"] / 255.0
        assert 0.0 <= r["max_abs_err"] <= code_width + 1e-12, r
        assert 0.0 <= r["mean_sq_err"] <= code_width * code_width + 1e-12, r
        assert r["n_vectors"] > 0


def test_negative_sampling_properties(spark, sf_dir):
    df = QUERIES["q_negative_sampling"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["neg_label"] != r["anchor_label"]
        assert r["neg_id"] != r["anchor_id"]
    # at most K slots survive per anchor, slot ids within range
    from cdmx_airquality_etl_spark.operators.llm_ops import _NEG_K

    per_anchor: dict = {}
    for r in rows:
        per_anchor.setdefault(r["anchor_id"], set()).add(r["slot"])
        assert 0 <= r["slot"] < _NEG_K
    assert all(len(s) <= _NEG_K for s in per_anchor.values())
    # determinism: a re-run is byte-identical (content-hash, no PRNG)
    again = sorted(map(tuple, QUERIES["q_negative_sampling"](spark, sf_dir).collect()))
    assert sorted(map(tuple, rows)) == again


def test_langid_confusion_fractions(spark, sf_dir):
    rows = QUERIES["q_langid_confusion"](spark, sf_dir).collect()
    assert rows
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["frac_of_lang"])
        assert r["n"] > 0
    for lang, fracs in by_lang.items():
        assert sum(fracs) == pytest.approx(1.0), lang
    # rollup totals equal the per-doc surface it derives from
    n_docs = QUERIES["q_lang_id"](spark, sf_dir).count()
    assert sum(r["n"] for r in rows) == n_docs


def test_approx_quantile_band_geometry(spark, sf_dir):
    rows = QUERIES["q_approx_quantile_band"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["band_lo"] <= r["exact_median"] <= r["band_hi"], r
        assert r["sketch_within_band"] == 1, r
        assert r["n"] > 0


def test_hard_negatives_properties(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.similarity import _HARD_NEG_K

    rows = QUERIES["q_hard_negatives"](spark, sf_dir).collect()
    assert rows
    per_anchor: dict = {}
    for r in rows:
        assert r["neg_label"] != r["anchor_label"]
        assert -1.0 - 1e-9 <= r["cosine_sim"] <= 1.0 + 1e-9
        per_anchor.setdefault(r["anchor_id"], []).append(r["cosine_sim"])
    for sims in per_anchor.values():
        assert len(sims) <= _HARD_NEG_K
        assert sims == sorted(sims, reverse=True)
    # hard negatives are harder than random ones: their mean similarity
    # must exceed the random sampler's cross-label mean
    import statistics

    hard_mean = statistics.mean(r["cosine_sim"] for r in rows)
    from cdmx_airquality_etl_spark.operators.similarity import _dot, _norm  # noqa: F401

    rand = QUERIES["q_negative_sampling"](spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    from pyspark.sql import functions as SF

    a = emb.select(SF.col("vec_id").alias("anchor_id"), SF.col("embedding").alias("ea"))
    b = emb.select(SF.col("vec_id").alias("neg_id"), SF.col("embedding").alias("eb"))
    joined = rand.join(a, "anchor_id").join(b, "neg_id")
    cos = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
    rand_mean = joined.select(SF.avg(cos).alias("m")).collect()[0]["m"]
    assert hard_mean > rand_mean


def test_vocab_coverage_curve(spark, sf_dir):
    rows = sorted(
        QUERIES["q_vocab_coverage"](spark, sf_dir).collect(), key=lambda r: r["k"]
    )
    assert len(rows) == 3
    prev = 0.0
    for r in rows:
        assert 0.0 < r["coverage"] <= 1.0
        assert r["coverage"] >= prev  # monotone in the vocab budget
        prev = r["coverage"]
        # a budget >= the whole vocab must cover everything
        if r["k"] >= r["vocab_size"]:
            assert r["covered"] == r["n_total"]


def test_classifier_reliability_consistency(spark, sf_dir):
    rows = QUERIES["q_classifier_reliability"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["pass_rate"] <= 1.0
        assert 0 <= r["n_pass"] <= r["n_docs"]
        # band geometry: the band's mean score lies inside the band
        assert r["band"] <= r["mean_score"] < r["band"] + 1
    n_docs = sum(r["n_docs"] for r in rows)
    assert n_docs == QUERIES["q_gopher_rules"](spark, sf_dir).count()


def test_dup_size_histogram_mass_balance(spark, sf_dir):
    rows = QUERIES["q_dup_size_histogram"](spark, sf_dir).collect()
    assert rows
    from cdmx_airquality_etl_spark.sources.parquet import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]


def test_class_weights_balance(spark, sf_dir):
    rows = QUERIES["q_class_weights"](spark, sf_dir).collect()
    assert rows
    assert sum(r["frequency"] for r in rows) == pytest.approx(1.0)
    n_total = sum(r["n_label"] for r in rows)
    # balanced-weights identity: sum_k w_k * n_k == N
    assert sum(r["class_weight"] * r["n_label"] for r in rows) == pytest.approx(
        n_total
    )
    # rarer label => strictly larger weight
    ordered = sorted(rows, key=lambda r: r["n_label"])
    for a, b in zip(ordered, ordered[1:]):
        if a["n_label"] < b["n_label"]:
            assert a["class_weight"] > b["class_weight"]


def test_asof_tolerance_never_matches_more_than_plain_asof(spark, sf_dir):
    plain = {
        r["error_event_id"]: r["click_event_id"]
        for r in QUERIES["q_asof_join"](spark, sf_dir).collect()
    }
    tol = {
        r["error_event_id"]: r["click_event_id"]
        for r in QUERIES["q_asof_tolerance"](spark, sf_dir).collect()
    }
    assert set(tol) == set(plain)  # LEFT semantics: same error rows
    for eid, cid in tol.items():
        # tolerance can only void a match, never change or invent one
        assert cid is None or cid == plain[eid]
    assert sum(v is not None for v in tol.values()) <= sum(
        v is not None for v in plain.values()
    )


def test_slice_recall_consistent_with_kappa(spark, sf_dir):
    slices = QUERIES["q_slice_recall"](spark, sf_dir).collect()
    assert slices
    for r in slices:
        assert 0 <= r["n_correct"] <= r["n_class"]
        assert r["recall"] == pytest.approx(r["n_correct"] / r["n_class"])
    kappa = QUERIES["q_cohen_kappa"](spark, sf_dir).collect()[0]
    assert sum(r["n_class"] for r in slices) == kappa["n_total"]
    assert sum(r["n_correct"] for r in slices) == kappa["n_agree"]


def test_hopping_window_mass_conservation(spark, sf_dir):
    from cdmx_airquality_etl_spark.sources.parquet import load_table

    rows = QUERIES["q_hopping_window"](spark, sf_dir).collect()
    assert rows
    n_events = load_table(spark, sf_dir, "events").count()
    # every event lands in exactly size/slide = 4 windows
    assert sum(r["n_events"] for r in rows) == 4 * n_events
    for r in rows:
        assert r["window_start_us"] % (900 * 1_000_000) == 0  # slide-aligned


def test_winsorized_mean_pulls_toward_center(spark, sf_dir):
    rows = QUERIES["q_winsorized_mean"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_clamped"] < r["n_orders"]  # ~10% of a smooth dist
        # clamping strictly reduces spread contribution; with a right-skewed
        # price distribution the winsorized mean moves, and stays positive
        assert r["winsorized_mean"] > 0
        assert abs(r["winsorized_mean"] - r["raw_mean"]) < r["raw_mean"]


def test_cramers_v_bounds(spark, sf_dir):
    r = QUERIES["q_cramers_v"](spark, sf_dir).collect()[0]
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["n_rows"] >= 2 and r["n_cols"] >= 2


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    rows = QUERIES["q_bootstrap_ci"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["boot_lo"] <= r["boot_hi"]
        # the point estimate should lie inside (or at worst graze) the CI
        assert r["boot_lo"] <= r["mean_value"] <= r["boot_hi"], r
        # CI width shrinks with n: sanity-bound it to a loose fraction
        assert (r["boot_hi"] - r["boot_lo"]) < abs(r["mean_value"]) * 2 + 1e9
    # determinism: identical on re-run
    again = QUERIES["q_bootstrap_ci"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kaplan_meier_is_a_survival_curve(spark, sf_dir):
    rows = sorted(
        QUERIES["q_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r["lifetime_days"],
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 < r["survival"] <= 1.0
        assert r["survival"] <= prev + 1e-12  # non-increasing in t
        prev = r["survival"]
        assert 0 <= r["n_churned"] <= r["n_at_risk"]
    # risk sets shrink as t grows
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_burstiness_matches_pandas_reference(spark, sf_dir):
    rows = QUERIES["q_burstiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] >= 8
        assert r["mean_gap_s"] > 0
        assert r["cv2"] >= 0 - 1e-12  # Var >= 0 always
    # independent per-user reference on the raw parquet
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    uid = rows[0]["user_id"]
    g = ev[ev.user_id == uid].copy()
    # pyarrow surfaces the TIMESTAMP(NANOS) column at datetime64[us], so
    # the raw int64 IS epoch-microseconds — identical to unix_micros(ts)
    g["us"] = g.ts.astype("int64")
    d = g.sort_values(["us", "event_id"]).us.diff().dropna()
    cv2 = len(d) * float((d.astype(object) ** 2).sum()) / float(d.sum()) ** 2 - 1
    got = {r["user_id"]: r for r in rows}[uid]
    assert got["n_gaps"] == len(d)
    assert got["cv2"] == pytest.approx(cv2, rel=1e-9)


def test_random_projection_distortion_concentrates(spark, sf_dir):
    rows = QUERIES["q_random_projection"](spark, sf_dir).collect()
    assert rows
    n = sum(r["n_vectors"] for r in rows)
    # the JL expectation: ratio mass concentrates around 1 (bucket 8 at
    # width 1/8); every bucket's min/max must live inside the bucket
    for r in rows:
        assert r["min_ratio"] >= r["bucket"] * 0.125
        assert r["max_ratio"] < (r["bucket"] + 1) * 0.125
        assert r["min_ratio"] <= r["max_ratio"]
        assert r["min_ratio"] > 0
    # k=16 ±1 projection: ratio stddev ≈ sqrt(2/k) ≈ 0.35, so ±2σ is
    # roughly [0.3, 1.7] — demand ≥95% of mass inside [0.25, 2.125)
    center = sum(r["n_vectors"] for r in rows if 2 <= r["bucket"] <= 16)
    assert center / n > 0.95, "JL distortion mass not concentrated near 1"


def test_dp_histogram_mechanism_invariants(spark, sf_dir):
    rows = QUERIES["q_dp_histogram"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["dp_noise"]) <= 16
        assert r["n_released"] == max(r["n_raw"] + r["dp_noise"], 0)
    # seeded mechanism: a re-run is byte-identical
    again = {
        r["event_type"]: r for r in QUERIES["q_dp_histogram"](spark, sf_dir).collect()
    }
    for r in rows:
        assert again[r["event_type"]]["dp_noise"] == r["dp_noise"]


def test_spatial_dbscan_roles_are_consistent(spark, sf_dir):
    rows = QUERIES["q_spatial_dbscan"](spark, sf_dir).collect()
    assert rows
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
        if r["role"] == "core":
            assert r["n_neighbors"] >= 4
        else:
            assert r["n_neighbors"] < 4
    # every point classified exactly once; all three grades exist at this
    # density or at least no unknown grade appears
    assert set(by_role) <= {"core", "border", "noise"}
    assert len(rows) == len({r["id"] for r in rows})


def test_pass_at_k_estimator_properties(spark, sf_dir):
    import math

    rows = QUERIES["q_pass_at_k"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, c = r["n_attempts"], r["n_correct"]
        assert n >= 3 and 0 <= c <= n
        assert 0.0 <= r["pass_at_k"] <= 1.0
        # exact combinatorial reference
        want = (
            1.0
            if n - c < 3
            else 1.0 - math.comb(n - c, 3) / math.comb(n, 3)
        )
        assert r["pass_at_k"] == pytest.approx(want, rel=1e-12)
        if c == 0:
            assert r["pass_at_k"] == pytest.approx(0.0, abs=1e-15)


def test_feature_hash_collision_mass_balance(spark, sf_dir):
    rows = QUERIES["q_feature_hash_collisions"](spark, sf_dir).collect()
    assert rows
    n_features = sum(r["n_features"] for r in rows)
    n_buckets = sum(r["n_buckets"] for r in rows)
    assert n_buckets <= 256
    for r in rows:
        assert r["n_features"] == r["occupancy"] * r["n_buckets"]
        assert r["n_collided"] == r["n_features"] - r["n_buckets"]
    # interaction features = distinct (source, token) pairs
    from pyspark.sql import functions as SF

    from cdmx_airquality_etl_spark.sources.parquet import load_table

    want = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            SF.explode(SF.split(SF.trim(SF.lower(SF.col("text"))), r"\s+")).alias("t"),
        )
        .filter(SF.col("t") != "")
        .distinct()
        .count()
    )
    assert n_features == want
    # with ~20x31 features in 256 buckets, collisions MUST exist
    assert any(r["occupancy"] > 1 for r in rows)


def test_simpson_diversity_bounds(spark, sf_dir):
    rows = QUERIES["q_simpson_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_types"] <= r["n_tokens"]
        # lambda lives in [1/S-ish, 1]; gini-simpson is its complement
        assert 0.0 <= r["simpson_lambda"] <= 1.0
        assert r["gini_simpson"] == pytest.approx(1.0 - r["simpson_lambda"])
        # a source with more than one type cannot be fully concentrated
        if r["n_types"] > 1:
            assert r["simpson_lambda"] < 1.0


def test_hilbert_encoder_matches_canonical_walk(spark, sf_dir):
    """The unrolled div/mod/CASE encoder must agree cell-for-cell with
    the canonical bitwise xy2d implementation over the whole grid."""
    from cdmx_airquality_etl_spark.operators.diagnostics import (
        _H_DIM,
        _hilbert_level,
    )

    def rot(n, x, y, rx, ry):
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        return x, y

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            x, y = rot(n, x, y, rx, ry)
            s //= 2
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(_H_DIM) for y in range(_H_DIM)], "px int, py int"
    ).selectExpr("px", "py", "px AS x", "py AS y", "0 AS d")
    s = _H_DIM // 2
    while s > 0:
        xn, yn, dn = _hilbert_level(s, "DIV")
        grid = grid.selectExpr("px", "py", f"{xn} AS x", f"{yn} AS y", f"{dn} AS d")
        s //= 2
    got = {(r["px"], r["py"]): r["d"] for r in grid.collect()}
    for x in range(_H_DIM):
        for y in range(_H_DIM):
            assert got[(x, y)] == xy2d(_H_DIM, x, y), (x, y)


def test_hilbert_beats_zorder_on_the_probe(spark, sf_dir):
    rows = {r["layout"]: r for r in QUERIES["q_hilbert_layout"](spark, sf_dir).collect()}
    assert set(rows) == {"hilbert", "zorder"}
    h, z = rows["hilbert"], rows["zorder"]
    assert h["n_rows"] == z["n_rows"]
    assert 0.0 < h["keep_rate"] <= z["keep_rate"]  # the curve's whole point
    for r in rows.values():
        assert r["n_files_kept"] <= r["n_files"]


def test_cuped_is_a_variance_reduction(spark, sf_dir):
    row = QUERIES["q_cuped"](spark, sf_dir).collect()[0]
    assert row["n_users"] > 0
    assert row["var_y"] > 0
    # var_cuped = var_y(1 - rho^2): never negative, never above var_y
    assert 0.0 <= row["var_cuped"] <= row["var_y"] + 1e-12
    assert 0.0 <= row["var_reduction"] <= 1.0
    assert row["var_cuped"] == pytest.approx(
        row["var_y"] * (1.0 - row["var_reduction"])
    )


def test_brier_decomposition_identity(spark, sf_dir):
    """Murphy identity with binned forecasts: total Brier == REL - RES +
    UNC + within-bin variance; with integer milli-probabilities all four
    reassemble exactly from the emitted sufficient statistics."""
    rows = QUERIES["q_brier_decomposition"](spark, sf_dir).collect()
    assert rows
    n = sum(r["n_docs"] for r in rows)
    n_pass = sum(r["n_pass"] for r in rows)
    obar = n_pass / n
    brier = sum(r["brier_bin"] * r["n_docs"] for r in rows) / n
    rel = sum(r["rel_term"] for r in rows)
    res = sum(r["res_term"] for r in rows)
    unc = obar * (1.0 - obar)
    for r in rows:
        pbar = r["sum_p_milli"] / (r["n_docs"] * 1000.0)
        assert 0.0 <= r["brier_bin"] <= 1.0
        assert r["rel_term"] >= 0.0 and r["res_term"] >= 0.0
        assert 0.0 <= pbar <= 1.0
        assert 0.0 <= r["obs_rate"] <= 1.0
    # decomposition bound: REL - RES + UNC differs from Brier only by the
    # (nonnegative) within-bin variance minus covariance residue; with
    # 100-milli bins that residue is < one bin width
    assert abs(brier - (rel - res + unc)) < 0.1
    assert 0.0 <= brier <= 1.0


def test_brier_bins_cover_all_scored_docs(spark, sf_dir):
    rows = QUERIES["q_brier_decomposition"](spark, sf_dir).collect()
    rel = QUERIES["q_classifier_reliability"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == sum(r["n_docs"] for r in rel)
    assert sum(r["n_pass"] for r in rows) == sum(r["n_pass"] for r in rel)


def test_triplet_margin_consistency(spark, sf_dir):
    rows = QUERIES["q_triplet_margin"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["margin"] == pytest.approx(r["hardest_pos"] - r["hardest_neg"])
        assert -1.0 - 1e-9 <= r["hardest_pos"] <= 1.0 + 1e-9
        assert r["n_semi_hard"] >= 0
    # brute-force reference for one anchor (exact over the same corpus
    # split; q_hard_negatives is LSH-bucket-bounded so NOT comparable)
    from pyspark.sql import functions as SF

    from cdmx_airquality_etl_spark.operators.similarity import (
        _BATCH_QUERIES,
        _dot,
        _nonzero,
        _norm,
    )
    from cdmx_airquality_etl_spark.sources.parquet import load_table

    emb = _nonzero(load_table(spark, sf_dir, "embeddings"))
    anchor = emb.filter(SF.col("vec_id") == 0).select(
        SF.col("label").alias("q_label"),
        SF.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_nrm"),
    )
    cos = _dot("embedding", "q_emb") / (SF.col("nrm") * SF.col("q_nrm"))
    scored = (
        emb.filter(SF.col("vec_id") >= _BATCH_QUERIES)
        .select("label", "embedding", _norm("embedding").alias("nrm"))
        .join(SF.broadcast(anchor))
        .select("label", "q_label", cos.alias("s"))
    )
    want_pos = scored.filter(SF.col("label") == SF.col("q_label")).agg(
        SF.max("s")
    ).collect()[0][0]
    want_neg = scored.filter(SF.col("label") != SF.col("q_label")).agg(
        SF.max("s")
    ).collect()[0][0]
    got = {r["anchor_id"]: r for r in rows}[0]
    assert got["hardest_pos"] == pytest.approx(want_pos, rel=1e-12)
    assert got["hardest_neg"] == pytest.approx(want_neg, rel=1e-12)


def test_changepoint_maximizes_gain(spark, sf_dir):
    row = QUERIES["q_changepoint"](spark, sf_dir).collect()[0]
    assert row["n_before"] >= 1 and row["n_after"] >= 1
    assert row["gain"] >= 0.0
    # independent reference: enumerate every split over the daily series
    from cdmx_airquality_etl_spark.operators.timeseries import _daily

    days = sorted(
        (r["d"], r["y"]) for r in _daily(spark, sf_dir).collect()
    )
    ys = [y for _, y in days]
    nd, t = len(ys), sum(ys)
    best = None
    for k in range(1, nd):
        s = sum(ys[:k])
        g = (k * (nd - k) / nd) * (s / k - (t - s) / (nd - k)) ** 2
        if best is None or g > best[1] + 1e-12:
            best = (days[k - 1][0], g)
    assert row["split_day"] == best[0]
    assert row["gain"] == pytest.approx(best[1], rel=1e-9)
    assert row["n_before"] + row["n_after"] == nd


def test_permutation_test_properties(spark, sf_dir):
    row = QUERIES["q_permutation_test"](spark, sf_dir).collect()[0]
    assert 1 <= row["n_perms"] <= 128
    assert 0 <= row["n_extreme"] <= row["n_perms"]
    assert 0.0 < row["p_value"] <= 1.0
    assert row["p_value"] == pytest.approx(
        (1.0 + row["n_extreme"]) / (1.0 + row["n_perms"])
    )
    # the null is TRUE here (cohort = user_id % 2 is unrelated to spend),
    # so the test must not report significance at the 1% level
    assert row["p_value"] > 0.01


def test_sax_words_cover_every_day(spark, sf_dir):
    rows = QUERIES["q_sax_symbols"](spark, sf_dir).collect()
    assert rows
    from cdmx_airquality_etl_spark.operators.timeseries import _daily

    n_days = _daily(spark, sf_dir).count()
    assert sum(r["n_days"] for r in rows) == n_days
    for r in rows:
        assert len(r["sax_word"]) == r["n_days"]
        assert set(r["sax_word"]) <= set("abcd")
    # z-scores of a real series hit both halves of the alphabet
    letters = "".join(r["sax_word"] for r in rows)
    assert set(letters) & {"a", "b"} and set(letters) & {"c", "d"}


def test_corr_matrix_is_upper_triangle_and_bounded(spark, sf_dir):
    rows = QUERIES["q_corr_matrix"](spark, sf_dir).collect()
    assert rows
    seen = set()
    types = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert (r["type_a"], r["type_b"]) not in seen
        seen.add((r["type_a"], r["type_b"]))
        types.update((r["type_a"], r["type_b"]))
        assert -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9
    k = len(types)
    assert len(rows) == k * (k - 1) // 2  # full upper triangle, no gaps


def test_roc_points_are_a_monotone_staircase(spark, sf_dir):
    rows = sorted(
        QUERIES["q_roc_points"](spark, sf_dir).collect(),
        key=lambda r: -r["threshold_band"],
    )
    assert rows
    prev_tp, prev_fp = -1, -1
    for r in rows:
        # lowering the threshold only adds kept docs
        assert r["tp"] >= prev_tp and r["fp"] >= prev_fp
        prev_tp, prev_fp = r["tp"], r["fp"]
        assert 0.0 <= r["tpr"] <= 1.0 and 0.0 <= r["fpr"] <= 1.0
        assert r["youden_j"] == pytest.approx(r["tpr"] - r["fpr"])
    # the lowest threshold keeps everything
    assert rows[-1]["tpr"] == pytest.approx(1.0)
    assert rows[-1]["fpr"] == pytest.approx(1.0)
    # totals agree with the Brier table (same banded population)
    brier = QUERIES["q_brier_decomposition"](spark, sf_dir).collect()
    assert rows[-1]["tp"] == sum(r["n_pass"] for r in brier)
    assert rows[-1]["tp"] + rows[-1]["fp"] == sum(r["n_docs"] for r in brier)


def test_power_analysis_closed_form(spark, sf_dir):
    import math

    row = QUERIES["q_power_analysis"](spark, sf_dir).collect()[0]
    assert row["n_pop"] > 0 and row["var_usd"] > 0 and row["mde_usd"] > 0
    z = 1.959963984540054 + 0.8416212335729143
    want = math.ceil(z * z * 2.0 * row["var_usd"] / row["mde_usd"] ** 2)
    assert row["n_required_per_arm"] == want
    # a 2% MDE on a high-variance metric needs real traffic
    assert row["n_required_per_arm"] > row["n_pop"] // 100


def test_assortativity_is_a_correlation(spark, sf_dir):
    row = QUERIES["q_assortativity"](spark, sf_dir).collect()[0]
    assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9
    # bi-directed edge count is even and matches the degree sum identity
    assert row["n_directed_edges"] % 2 == 0


def test_modularity_terms_reassemble(spark, sf_dir):
    rows = QUERIES["q_modularity"](spark, sf_dir).collect()
    assert rows
    m2 = sum(r["degree_total"] for r in rows)
    q = 0.0
    for r in rows:
        assert 0 <= r["within_directed"] <= r["degree_total"]
        assert r["modularity_term"] == pytest.approx(
            r["within_directed"] / m2 - (r["degree_total"] / m2) ** 2
        )
        q += r["modularity_term"]
    # Q is always < 1 and > -1; a bipartite graph with communities that
    # mix customers and suppliers of one nation has few within edges only
    # if trade is cross-national, so just pin the mathematical range
    assert -1.0 < q < 1.0


def test_neyman_allocation_properties(spark, sf_dir):
    rows = QUERIES["q_neyman_allocation"](spark, sf_dir).collect()
    assert rows
    shares = sum(r["alloc_share"] for r in rows)
    assert shares == pytest.approx(1.0)
    assert sum(r["n_alloc"] for r in rows) <= 1000  # floors never overshoot
    for r in rows:
        assert r["sd_cents"] > 0 and r["n_pop"] > 1
        assert 0.0 < r["alloc_share"] < 1.0
    # optimality direction: bigger N*sd never gets a smaller allocation
    ordered = sorted(rows, key=lambda r: r["n_pop"] * r["sd_cents"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["n_alloc"] <= b["n_alloc"]


def test_spearman_matches_scipy_convention(spark, sf_dir):
    rows = QUERIES["q_spearman_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["spearman_rho"] <= 1.0 + 1e-9
    # reference via pandas average ranks for one pair
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev.ts.astype("int64") // 86_400_000_000
    pick = rows[0]
    piv = (
        ev.groupby(["d", "event_type"]).size().unstack(fill_value=0)
    )
    ra = piv[pick["type_a"]].rank(method="average")
    rb = piv[pick["type_b"]].rank(method="average")
    want = ra.corr(rb)  # Pearson of average ranks == Spearman
    assert pick["spearman_rho"] == pytest.approx(want, rel=1e-9)


def test_anova_decomposition_identity(spark, sf_dir):
    row = QUERIES["q_anova_oneway"](spark, sf_dir).collect()[0]
    assert row["k"] == 5
    assert row["ss_between"] >= 0 and row["ss_within"] >= 0
    assert 0.0 <= row["eta_sq"] <= 1.0
    assert row["eta_sq"] == pytest.approx(
        row["ss_between"] / (row["ss_between"] + row["ss_within"])
    )
    assert row["f_stat"] == pytest.approx(
        (row["ss_between"] / (row["k"] - 1))
        / (row["ss_within"] / (row["n_total"] - row["k"]))
    )
    # priority is assigned independently of value: eta^2 must be tiny
    assert row["eta_sq"] < 0.01


def test_wilson_interval_brackets_and_beats_wald_at_edges(spark, sf_dir):
    rows = QUERIES["q_wilson_ci"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0
        # Wilson never collapses to a point even at p==0 or 1
        assert r["wilson_hi"] - r["wilson_lo"] > 0.0


def test_prefix_sharing_mass_balance(spark, sf_dir):
    rows = QUERIES["q_prefix_sharing"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["docs_total"] == r["group_size"] * r["n_groups"]
        assert r["cacheable_prefix_tokens"] == (
            (r["group_size"] - 1) * r["n_groups"] * 8
        )
    # every >=8-token doc lands in exactly one prefix group
    from pyspark.sql import functions as SF

    from cdmx_airquality_etl_spark.sources.parquet import load_table

    want = (
        load_table(spark, sf_dir, "documents")
        .filter(SF.col("text").isNotNull())
        .filter(SF.size(SF.split(SF.trim(SF.lower("text")), r"\s+")) >= 8)
        .count()
    )
    assert sum(r["docs_total"] for r in rows) == want


def test_deletion_impact_counts(spark, sf_dir):
    rows = {r["table_name"]: r["rows_affected"] for r in
            QUERIES["q_deletion_impact"](spark, sf_dir).collect()}
    assert set(rows) == {"customer", "events", "orders", "lineitem"}
    assert rows["customer"] >= 1
    # cascades can only amplify: lineitems >= orders of the same subjects
    assert rows["lineitem"] >= rows["orders"]
    # independent check of the orders count
    from pyspark.sql import functions as SF

    from cdmx_airquality_etl_spark.sources.parquet import load_table

    want = (
        load_table(spark, sf_dir, "orders")
        .filter(SF.col("o_custkey") % 97 == 7)
        .count()
    )
    assert rows["orders"] == want


def test_holt_winters_matches_python_replay(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.timeseries import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_SEASON,
        _daily,
    )

    rows = sorted(
        QUERIES["q_holt_winters"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    days = {r["d"]: r["y"] for r in _daily(spark, sf_dir).collect()}
    mn, mx = min(days), max(days)
    ys = [days.get(d, 0) for d in range(mn, mx + 1)]
    m, a, b_, g = _HW_SEASON, _HW_ALPHA, _HW_BETA, _HW_GAMMA
    if len(ys) < 2 * m:
        assert rows == []
        return
    l = sum(ys[:m]) / float(m)
    b = (sum(ys[m : 2 * m]) / float(m) - sum(ys[:m]) / float(m)) / float(m)
    s = [y - l for y in ys[:m]]
    ref = []
    for t in range(m, len(ys)):
        y = ys[t]
        fitted = l + b + s[0]
        l_new = a * (y - s[0]) + (1 - a) * (l + b)
        b_new = b_ * (l_new - l) + (1 - b_) * b
        s_new = g * (y - l_new) + (1 - g) * s[0]
        ref.append((mn + t, y, l_new, b_new, s_new, fitted, y - fitted))
        l, b, s = l_new, b_new, s[1:] + [s_new]
    assert len(rows) == len(ref)
    for r, (day, y, lv, tr, se, fit, resid) in zip(rows, ref):
        assert r["day"] == day and r["y"] == y
        assert r["level"] == pytest.approx(lv, rel=1e-12)
        assert r["trend"] == pytest.approx(tr, rel=1e-12, abs=1e-12)
        assert r["seasonal"] == pytest.approx(se, rel=1e-12, abs=1e-12)
        assert r["fitted"] == pytest.approx(fit, rel=1e-12)
        assert r["resid"] == pytest.approx(resid, rel=1e-9, abs=1e-9)
    # the fit should track the series: residuals are centered near zero
    # relative to the series scale
    mean_abs_resid = sum(abs(x[-1]) for x in ref) / len(ref)
    assert mean_abs_resid < 2 * (max(ys) - min(ys) + 1)


def test_forecast_backtest_reconciles_with_holt_winters(spark, sf_dir):
    rows = {r["model"]: r for r in QUERIES["q_forecast_backtest"](spark, sf_dir).collect()}
    assert set(rows) == {"holt_winters", "naive", "seasonal_naive"}
    n = {r["n_days"] for r in rows.values()}
    assert len(n) == 1
    sn = rows["seasonal_naive"]
    assert sn["mase"] == 1.0  # the scale's own MASE is exactly 1
    for r in rows.values():
        assert r["mae"] >= 0.0
        assert r["mase"] == r["mae"] / sn["mae"]
    # HW's MAE equals the mean |resid| of its own fitted table
    hw = QUERIES["q_holt_winters"](spark, sf_dir).collect()
    mean_abs = sum(abs(x["resid"]) for x in hw) / len(hw)
    assert rows["holt_winters"]["mae"] == pytest.approx(mean_abs, rel=1e-12)
    assert rows["holt_winters"]["n_days"] == len(hw)
