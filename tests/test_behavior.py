"""Semantics tests for the behavioral-analytics batch
(operators/behavior.py), with pandas replays."""

import pandas as pd
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.behavior import (
    _ATTR_WINDOW_DAYS,
    _ORDER_SPAN_DAYS,
)
from cdmx_airquality_etl_spark.registry import QUERIES


def _events(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["ts"] = pd.to_datetime(ev["ts"])
    return ev


# ---------------------------------------------------------------------------
# q_attribution
# ---------------------------------------------------------------------------
def test_attribution_models_credit_same_conversions(spark, sf_dir):
    rows = QUERIES["q_attribution"](spark, sf_dir).collect()
    assert rows
    first = sum(r["n_conversions"] for r in rows if r["model"] == "first_touch")
    last = sum(r["n_conversions"] for r in rows if r["model"] == "last_touch")
    assert first == last  # both models credit exactly the attributable set


def test_attribution_matches_pandas(spark, sf_dir):
    rows = {(r["model"], r["event_type"]): r["n_conversions"] for r in QUERIES["q_attribution"](spark, sf_dir).collect()}
    ev = _events(sf_dir)
    conv = ev[ev.event_type == "purchase"]
    touch = ev[ev.event_type.isin(["click", "view"])]
    got = {}
    for c in conv.itertuples():
        cand = touch[
            (touch.user_id == c.user_id)
            & (touch.ts < c.ts)
            & (touch.ts >= c.ts - pd.Timedelta(days=_ATTR_WINDOW_DAYS))
        ].sort_values(["ts", "event_id"])
        if len(cand) == 0:
            continue
        got[("first_touch", cand.iloc[0]["event_type"])] = got.get(("first_touch", cand.iloc[0]["event_type"]), 0) + 1
        got[("last_touch", cand.iloc[-1]["event_type"])] = got.get(("last_touch", cand.iloc[-1]["event_type"]), 0) + 1
    assert rows == got


# ---------------------------------------------------------------------------
# q_stickiness
# ---------------------------------------------------------------------------
def test_stickiness_bounds_and_replay(spark, sf_dir):
    rows = {r["wk"]: r for r in QUERIES["q_stickiness"](spark, sf_dir).collect()}
    ev = _events(sf_dir)
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    ev["wk"] = ev["day"] // 7
    for wk, g in ev.groupby("wk"):
        r = rows[wk]
        dau_sum = g.groupby("day")["user_id"].nunique().sum()
        wau = g["user_id"].nunique()
        n_days = g["day"].nunique()
        assert r["dau_sum"] == dau_sum
        assert r["wau"] == wau
        assert r["n_days"] == n_days
        assert abs(r["stickiness"] - dau_sum / (n_days * wau)) < 1e-12
        assert 0.0 < r["stickiness"] <= 1.0


# ---------------------------------------------------------------------------
# q_conversion_lag
# ---------------------------------------------------------------------------
def test_conversion_lag_matches_pandas(spark, sf_dir):
    rows = {r["lag_days"]: r["n_users"] for r in QUERIES["q_conversion_lag"](spark, sf_dir).collect()}
    ev = _events(sf_dir)
    got = {}
    for uid, g in ev.groupby("user_id"):
        v = g.loc[g.event_type == "view", "ts"].min()
        p = g.loc[g.event_type == "purchase", "ts"].min()
        if pd.isna(v) or pd.isna(p) or p < v:
            continue
        lag = (p.normalize() - v.normalize()).days
        got[lag] = got.get(lag, 0) + 1
    assert rows == got


# ---------------------------------------------------------------------------
# q_interval_merge
# ---------------------------------------------------------------------------
def test_interval_merge_matches_pandas(spark, sf_dir):
    rows = {r["c_custkey"]: r for r in QUERIES["q_interval_merge"](spark, sf_dir).collect()}
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    orders["s"] = (pd.to_datetime(orders["o_orderdate"]).dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    for ck, g in list(orders.groupby("o_custkey"))[:40]:
        ivs = sorted((s, s + _ORDER_SPAN_DAYS) for s in g["s"])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        r = rows[ck]
        assert r["n_orders"] == len(g)
        assert r["n_intervals"] == len(merged)
        assert r["covered_days"] == sum(e - s for s, e in merged)


# ---------------------------------------------------------------------------
# q_power_users
# ---------------------------------------------------------------------------
def test_power_users_matches_pandas(spark, sf_dir):
    r = QUERIES["q_power_users"](spark, sf_dir).collect()[0]
    ev = _events(sf_dir)
    per_user = ev.groupby("user_id").size().sort_values(ascending=False)
    n_users = len(per_user)
    k = n_users // 10
    # tiebreak: count desc, user_id asc
    ranked = sorted(per_user.items(), key=lambda kv: (-kv[1], kv[0]))
    power = sum(n for _, n in ranked[:k])
    assert r["n_users"] == n_users
    assert r["n_power_users"] == k
    assert r["n_events"] == len(ev)
    assert r["power_events"] == power
    assert abs(r["power_share"] - power / len(ev)) < 1e-12
    assert r["power_share"] >= k / n_users  # top decile is at least proportional


# ---------------------------------------------------------------------------
# q_markov_attribution
# ---------------------------------------------------------------------------
def test_markov_attribution_matches_pandas(spark, sf_dir):
    from cdmx_airquality_etl_spark.operators.behavior import _MK_ITERS

    rows = {
        r["channel"]: r
        for r in QUERIES["q_markov_attribution"](spark, sf_dir).collect()
    }
    ev = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])

    # journey assembly: start -> touches before first purchase -> conv/null
    counts = {}
    for uid, g in ev.groupby("user_id"):
        pur = g[g.event_type == "purchase"]
        if len(pur):
            first = pur.iloc[0]
            g = g[
                (g.ts < first.ts)
                | ((g.ts == first.ts) & (g.event_id < first.event_id))
            ]
            end = "conv"
        else:
            end = "null"
        seq = ["start"] + [
            t for t in g.event_type if t != "purchase"
        ] + [end]
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    out = {}
    for (a, _b), c in counts.items():
        out[a] = out.get(a, 0) + c
    trans = {k: c / out[k[0]] for k, c in counts.items()}
    states = sorted({a for a, _ in trans} | {"conv", "null"})

    def absorb(removed):
        v = {s: 1.0 if s == "conv" else 0.0 for s in states}
        for _ in range(_MK_ITERS):
            nv = {}
            for s in states:
                if s == "conv":
                    nv[s] = 1.0
                elif s == "null" or s == removed:
                    nv[s] = 0.0
                else:
                    nv[s] = sum(
                        p * v[d]
                        for (a, d), p in sorted(trans.items())
                        if a == s
                    )
            v = nv
        return v["start"]

    p_base = absorb(None)
    assert p_base > 0.0
    effects = {
        c: (p_base - absorb(c)) / p_base
        for c in ("click", "error", "signup", "view")
    }
    tot = sum(max(e, 0.0) for e in effects.values())
    assert set(rows) == set(effects)
    for c, e in effects.items():
        r = rows[c]
        assert abs(r["p_conv_base"] - p_base) < 1e-12
        assert abs(r["removal_effect"] - e) < 1e-9
        share = max(e, 0.0) / tot if tot > 0 else 0.0
        assert abs(r["attribution_share"] - share) < 1e-9
        assert 0.0 <= r["attribution_share"] <= 1.0
    assert abs(sum(r["attribution_share"] for r in rows.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# q_cohort_ltv
# ---------------------------------------------------------------------------
def test_cohort_ltv_monotone_and_reconciles(spark, sf_dir):
    import math

    rows = QUERIES["q_cohort_ltv"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    total_usd = int(orders["o_totalprice"].map(math.floor).sum())
    assert sum(r["rev_usd"] for r in rows) == total_usd
    n_custs_total = orders["o_custkey"].nunique()
    assert sum(cells[0]["n_custs"] for cells in by_cohort.values()) == n_custs_total
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r["age_months"])
        assert cells[0]["age_months"] == 0  # acquisition month is present
        run = 0
        for c in cells:
            assert c["age_months"] >= 0
            run += c["rev_usd"]
            assert c["cum_rev"] == run  # cumulative reconciles exactly
            assert c["ltv_usd"] == c["cum_rev"] / c["n_custs"]


# ---------------------------------------------------------------------------
# q_session_paths
# ---------------------------------------------------------------------------
def test_session_paths_reconciles_with_sessionize(spark, sf_dir):
    rows = sorted(
        QUERIES["q_session_paths"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert rows and len(rows) <= 20
    n_sessions_total = QUERIES["q_sessionize"](spark, sf_dir).count()
    # ranks are 1..k with counts non-increasing, shares over ALL sessions
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["n_sessions"] >= b["n_sessions"]
    for r in rows:
        assert r["share"] == r["n_sessions"] / n_sessions_total
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 8
        assert all(s in {"view", "click", "signup", "purchase", "error"} for s in steps)
    assert sum(r["share"] for r in rows) <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# q_shapley_attribution
# ---------------------------------------------------------------------------
def test_shapley_efficiency_and_replay(spark, sf_dir):
    import itertools

    rows = {
        r["channel"]: r
        for r in QUERIES["q_shapley_attribution"](spark, sf_dir).collect()
    }
    channels = ("click", "error", "signup", "view")
    assert set(rows) == set(channels)
    tot = rows["click"]["total_conversions"]
    base = rows["click"]["baseline_conversions"]
    # efficiency axiom: credits sum to v(all) - v(none)
    s = sum(r["shapley_conversions"] for r in rows.values())
    assert abs(s - (tot - base)) < 1e-6
    assert abs(sum(r["attribution_share"] for r in rows.values()) - 1.0) < 1e-9
    # independent replay from raw events
    ev = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    masks = {}  # user -> (mask, conv)
    for uid, g in ev.groupby("user_id"):
        pur = g[g.event_type == "purchase"]
        if len(pur):
            first = pur.iloc[0]
            pre = g[
                (g.ts < first.ts)
                | ((g.ts == first.ts) & (g.event_id < first.event_id))
            ]
            conv = 1
        else:
            pre, conv = g, 0
        mask = 0
        for i, c in enumerate(channels):
            if (pre.event_type == c).any():
                mask |= 1 << i
        masks[uid] = (mask, conv)
    cells = {}
    for mask, conv in masks.values():
        cells[mask] = cells.get(mask, 0) + conv

    def v(S):
        return sum(c for m, c in cells.items() if (m & S) == m)

    import math

    for i, c in enumerate(channels):
        phi = 0.0
        for k in range(4):
            for S in itertools.combinations([j for j in range(4) if j != i], k):
                sm = sum(1 << j for j in S)
                w = math.factorial(k) * math.factorial(3 - k) / 24.0
                phi += w * (v(sm | (1 << i)) - v(sm))
        assert rows[c]["shapley_conversions"] == __import__("pytest").approx(
            phi, abs=1e-9
        )
    assert tot == v(15) and base == v(0)
