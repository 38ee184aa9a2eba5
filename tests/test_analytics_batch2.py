"""Semantics tests for the analytics/graph batch-2 operators: label
propagation, Q8 market share, changelog apply, Markov transitions, Welch."""

import math

from cdmx_airquality_etl_spark.registry import QUERIES
from cdmx_airquality_etl_spark.sources.parquet import load_table


def test_label_propagation_partitions(spark, sf_dir):
    rows = QUERIES["q_label_propagation"](spark, sf_dir).collect()
    assert rows
    sizes = [r["n_members"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert len({r["community"] for r in rows}) == len(rows)
    assert all(s > 0 for s in sizes)


def test_market_share_bounds(spark, sf_dir):
    rows = {r["yr"]: r for r in QUERIES["q_tpch_market_share"](spark, sf_dir).collect()}
    assert set(rows) <= {1996, 1997}
    for r in rows.values():
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_volume"] > 0


def test_changelog_apply_roundtrip(spark, sf_dir):
    row = QUERIES["q_changelog_apply"](spark, sf_dir).collect()[0]
    assert row["n_mismatch"] == 0, "reconstruction must equal the v2 snapshot"
    assert row["n_recon"] == row["n_v2"] > 0


def test_event_transitions_rows_normalize(spark, sf_dir):
    rows = QUERIES["q_event_transitions"](spark, sf_dir).collect()
    assert rows
    by_from: dict[str, float] = {}
    for r in rows:
        assert r["n_transitions"] > 0
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p_transition"]
    for total in by_from.values():
        assert math.isclose(total, 1.0, rel_tol=1e-12)


def test_event_transitions_counts_match_manual(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["event_type"]))
    expected: dict[tuple, int] = {}
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            expected[(a, b)] = expected.get((a, b), 0) + 1
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in QUERIES["q_event_transitions"](spark, sf_dir).collect()
    }
    assert got == expected


def test_ab_welch_matches_manual(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    groups = {0: [], 1: []}
    for r in orders:
        groups[r["o_custkey"] % 2].append(float(math.floor(r["o_totalprice"])))
    row = QUERIES["q_ab_welch"](spark, sf_dir).collect()[0]
    stats = {}
    for c, xs in groups.items():
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        stats[c] = (n, m, v)
    na, ma, va = stats[0]
    nb, mb, vb = stats[1]
    assert row["n_a"] == na and row["n_b"] == nb
    assert math.isclose(row["mean_a_usd"], ma, rel_tol=1e-9)
    assert math.isclose(row["mean_b_usd"], mb, rel_tol=1e-9)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert math.isclose(row["t_welch"], t, rel_tol=1e-9)
    dof = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert math.isclose(row["dof_satterthwaite"], dof, rel_tol=1e-9)


def test_funnel_windowed_tightens_unbounded_funnel(spark, sf_dir):
    rows = QUERIES["q_funnel_windowed"](spark, sf_dir).collect()
    assert rows
    for step in ("click", "purchase"):
        sub = [r for r in rows if r["step"] == step]
        if not sub:
            continue
        assert all(0 <= r["lag_days"] <= 7 for r in sub)
        assert abs(sum(r["step_share"] for r in sub) - 1.0) < 1e-9
        rates = {r["funnel_rate"] for r in sub}
        assert len(rates) == 1  # constant within a step
        assert 0.0 < rates.pop() <= 1.0
    # the windowed funnel can never beat the unbounded one
    unb = QUERIES["q_funnel"](spark, sf_dir).collect()[0]
    n_click = sum(r["n_users"] for r in rows if r["step"] == "click")
    n_pur = sum(r["n_users"] for r in rows if r["step"] == "purchase")
    assert n_click <= unb["n_click"]
    assert n_pur <= unb["n_purchase"]


def test_ab_sequential_consistency(spark, sf_dir):
    rows = sorted(
        QUERIES["q_ab_sequential"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    # information fraction is nondecreasing and ends at exactly 1.0
    for a, b in zip(rows, rows[1:]):
        assert a["info_frac"] <= b["info_frac"]
        assert a["n_a"] <= b["n_a"] and a["n_b"] <= b["n_b"]
    assert rows[-1]["info_frac"] == 1.0
    # the boundary decays toward the constant; crossing flag is consistent
    for r in rows:
        assert r["z_boundary"] >= 2.5
        assert r["crossed"] == (1 if abs(r["z_welch"]) >= r["z_boundary"] else 0)
    # the final day's z IS q_ab_welch's t (same moments, same expression)
    welch = QUERIES["q_ab_welch"](spark, sf_dir).collect()[0]
    assert rows[-1]["z_welch"] == welch["t_welch"]
    assert rows[-1]["n_a"] == welch["n_a"] and rows[-1]["n_b"] == welch["n_b"]


def test_diff_in_diff_matches_pandas(spark, sf_dir):
    import math

    import pyarrow.parquet as pq

    row = QUERIES["q_diff_in_diff"](spark, sf_dir).collect()[0]
    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    o["day"] = (
        o["o_orderdate"].dt.normalize() - __import__("pandas").Timestamp("1970-01-01")
    ).dt.days
    o["usd"] = o["o_totalprice"].map(math.floor)
    split = (o["day"].min() + o["day"].max()) // 2
    cells = {}
    for c in (0, 1):
        for p in (0, 1):
            sel = o[(o.o_custkey % 2 == c) & ((o.day >= split).astype(int) == p)]
            cells[(c, p)] = (len(sel), sel["usd"].mean(), sel["usd"].var(ddof=1))
    did = (cells[(1, 1)][1] - cells[(1, 0)][1]) - (
        cells[(0, 1)][1] - cells[(0, 0)][1]
    )
    se = math.sqrt(sum(v / n for n, _, v in cells.values()))
    assert row["mean_treat_pre"] == __import__("pytest").approx(cells[(1, 0)][1], rel=1e-12)
    assert row["mean_ctrl_post"] == __import__("pytest").approx(cells[(0, 1)][1], rel=1e-12)
    assert row["did"] == __import__("pytest").approx(did, rel=1e-9, abs=1e-9)
    assert row["se"] == __import__("pytest").approx(se, rel=1e-9)
    assert row["t_stat"] == __import__("pytest").approx(did / se, rel=1e-9, abs=1e-9)


def test_fdr_screen_bh_procedure(spark, sf_dir):
    rows = sorted(
        QUERIES["q_fdr_screen"](spark, sf_dir).collect(),
        key=lambda r: r["p_rank"],
    )
    assert rows
    m = len(rows)
    # ranks are a permutation ordered by p-value
    assert [r["p_rank"] for r in rows] == list(range(1, m + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["p_value"] <= b["p_value"]
    # BH step-up replay
    kstar = max(
        (r["p_rank"] for r in rows if r["p_value"] <= r["p_rank"] * 0.1 / m),
        default=0,
    )
    for r in rows:
        assert r["bh_threshold"] == r["p_rank"] * 0.1 / m
        assert r["rejected"] == (1 if r["p_rank"] <= kstar else 0)
        assert 0.0 < r["p_value"] <= 1.0
        assert 1 <= r["n_perms"] <= 128
    # rejections are a prefix of the p-ordered list (step-up property)
    flags = [r["rejected"] for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_srm_check_replays_from_users(spark, sf_dir):
    import pyarrow.parquet as pq

    row = QUERIES["q_srm_check"](spark, sf_dir).collect()[0]
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    users = ev["user_id"].drop_duplicates()
    na = int((users % 2 == 0).sum())
    nb = int((users % 2 == 1).sum())
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["ratio_a"] == na / (na + nb)
    chi2 = (na - nb) ** 2 / (na + nb)
    assert abs(row["chi2"] - chi2) < 1e-12
    assert row["srm_detected"] == (1 if chi2 > 10.828 else 0)
    # the synthetic hash split is healthy: no mismatch expected
    assert row["srm_detected"] == 0
