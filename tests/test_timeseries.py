"""Semantics tests for the time-series batch (operators/timeseries.py):
each series statistic is replayed independently with pandas/numpy."""

import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.operators.timeseries import (
    _ACF_MAX_LAG,
    _EWMA_SPAN,
    _ROLL_W,
)
from cdmx_airquality_etl_spark.registry import QUERIES


def _events(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ts = pd.to_datetime(ev["ts"])
    ev["d"] = (ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    return ev


def _daily(ev):
    return ev.groupby("d").size().sort_index()


# ---------------------------------------------------------------------------
# q_ewma_daily
# ---------------------------------------------------------------------------
def test_ewma_matches_manual_truncated(spark, sf_dir):
    rows = {r["day"]: r for r in QUERIES["q_ewma_daily"](spark, sf_dir).collect()}
    daily = _daily(_events(sf_dir))
    for day, y in daily.items():
        num = den = 0
        for i, yi in daily.items():
            if day - (_EWMA_SPAN - 1) <= i <= day:
                w = 2 ** (_EWMA_SPAN - 1 - (day - i))
                num += yi * w
                den += w
        r = rows[day]
        assert r["n_events"] == y
        assert abs(r["ewma"] - num / den) < 1e-12


def test_ewma_smooths_toward_recent(spark, sf_dir):
    # the most recent day carries half the total weight of its window
    rows = QUERIES["q_ewma_daily"](spark, sf_dir).collect()
    for r in rows:
        assert r["ewma"] > 0


# ---------------------------------------------------------------------------
# q_acf_daily
# ---------------------------------------------------------------------------
def test_acf_matches_numpy(spark, sf_dir):
    rows = {r["lag"]: r["acf"] for r in QUERIES["q_acf_daily"](spark, sf_dir).collect()}
    y = _daily(_events(sf_dir))
    # series indexed by day; pairs at lag k use days (d, d+k) both present
    yd = dict(y)
    n, s = len(y), y.sum()
    mean = s / n
    den = ((y - mean) ** 2).sum()
    for k in range(1, _ACF_MAX_LAG + 1):
        num = sum(
            (yd[d] - mean) * (yd[d + k] - mean) for d in yd if d + k in yd
        )
        assert abs(rows[k] - num / den) < 1e-9
        assert -1.0 <= rows[k] <= 1.0


# ---------------------------------------------------------------------------
# q_cusum_shift
# ---------------------------------------------------------------------------
def test_cusum_replays_recursion(spark, sf_dir):
    rows = {r["day"]: r["cusum"] for r in QUERIES["q_cusum_shift"](spark, sf_dir).collect()}
    y = _daily(_events(sf_dir))
    mu = y.sum() / len(y)
    s = 0.0
    for d, yd in y.items():
        s = max(0.0, s + (yd - mu))
        assert abs(rows[d] - s) < 1e-6
    assert all(v >= 0 for v in rows.values())


# ---------------------------------------------------------------------------
# q_ohlc_vwap
# ---------------------------------------------------------------------------
def test_ohlc_matches_pandas(spark, sf_dir):
    rows = QUERIES["q_ohlc_vwap"](spark, sf_dir).collect()
    ev = _events(sf_dir)
    ev["wk"] = ev["d"] // 7
    ev["w"] = ev["props"].map(lambda p: json.loads(p)["k"])
    for r in rows:
        g = ev[(ev.event_type == r["event_type"]) & (ev.wk == r["wk"])].sort_values(
            ["ts", "event_id"]
        )
        assert r["open"] == g.iloc[0]["value"]
        assert r["close"] == g.iloc[-1]["value"]
        assert r["high"] == g["value"].max()
        assert r["low"] == g["value"].min()
        assert r["volume"] == g["w"].sum()
        if g["w"].sum() > 0:
            vwap = (g["value"] * g["w"]).sum() / g["w"].sum()
            assert abs(r["vwap"] - vwap) < 1e-9
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


# ---------------------------------------------------------------------------
# q_rolling_corr
# ---------------------------------------------------------------------------
def test_rolling_corr_matches_pandas(spark, sf_dir):
    rows = {r["day"]: r["corr7"] for r in QUERIES["q_rolling_corr"](spark, sf_dir).collect()}
    ev = _events(sf_dir)
    ev = ev[ev.event_type.isin(["click", "view"])]
    tab = (
        ev.pivot_table(index="d", columns="event_type", values="event_id", aggfunc="count")
        .fillna(0)
        .sort_index()
    )
    x, y = tab["click"].to_numpy(), tab["view"].to_numpy()
    days = tab.index.to_numpy()
    for i in range(_ROLL_W - 1, len(days)):
        xs, ys = x[i - _ROLL_W + 1 : i + 1], y[i - _ROLL_W + 1 : i + 1]
        if xs.std() == 0 or ys.std() == 0:
            assert rows[days[i]] is None
        else:
            assert abs(rows[days[i]] - np.corrcoef(xs, ys)[0, 1]) < 1e-9
    for v in rows.values():
        if v is not None:
            assert -1.0 - 1e-12 <= v <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# q_period_over_period
# ---------------------------------------------------------------------------
def test_pop_lag_consistency(spark, sf_dir):
    rows = sorted(
        QUERIES["q_period_over_period"](spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["mom_delta"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert abs(cur["mom_delta"] - (cur["revenue"] - prev["revenue"])) < 1e-6
        assert abs(cur["mom_pct"] - cur["mom_delta"] / prev["revenue"]) < 1e-12


# ---------------------------------------------------------------------------
# q_running_distinct
# ---------------------------------------------------------------------------
def test_running_distinct_is_true_prefix_distinct(spark, sf_dir):
    rows = sorted(
        QUERIES["q_running_distinct"](spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    ev = _events(sf_dir)
    for r in rows:
        upto = ev[ev.d <= r["day"]]
        assert r["cum_users"] == len(upto.groupby(["user_id", "event_type"]).size())
    assert sum(r["new_users"] for r in rows) == rows[-1]["cum_users"]
