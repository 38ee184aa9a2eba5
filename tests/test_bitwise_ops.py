"""Semantics tests for the bitwise-aggregate batch
(operators/bitwise_ops.py)."""

import pandas as pd
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.bitwise_ops import _MASK_BITS
from cdmx_airquality_etl_spark.registry import QUERIES


def _events(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["day"] = (pd.to_datetime(ev["ts"]).dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    return ev


def test_bitmap_presence_matches_python(spark, sf_dir):
    rows = {r["event_type"]: r for r in QUERIES["q_bitmap_presence"](spark, sf_dir).collect()}
    ev = _events(sf_dir)
    masks = {}
    for et, g in ev.groupby("event_type"):
        mask = 0
        for d in g["day"].unique():
            mask |= 1 << (int(d) % _MASK_BITS)
        masks[et] = mask
        r = rows[et]
        assert r["presence_mask"] == mask
        assert r["n_slots"] == bin(mask).count("1")
        assert r["n_days"] == g["day"].nunique()
        # the corpus spans <= _MASK_BITS days, so the fold is collision-free
        assert r["n_slots"] == r["n_days"]
    common = None
    for m in masks.values():
        common = m if common is None else (common & m)
    for r in rows.values():
        assert r["n_common_slots"] == bin(common).count("1")


def test_drawdown_replays_recursion(spark, sf_dir):
    rows = sorted(QUERIES["q_drawdown"](spark, sf_dir).collect(), key=lambda r: r["day"])
    ev = _events(sf_dir)
    ev = ev[ev.event_type.isin(["purchase", "error"])]
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev.loc[ev.event_type == "error", "cents"] *= -1
    daily = ev.groupby("day")["cents"].sum().sort_index()
    cum = peak = 0
    first = True
    for r, (d, net) in zip(rows, daily.items()):
        assert r["day"] == d
        cum = net if first else cum + net
        peak = cum if first else max(peak, cum)
        first = False
        assert r["cum_net"] == cum / 100.0
        assert r["peak"] == peak / 100.0
        assert r["drawdown"] == (peak - cum) / 100.0
        assert r["underwater"] == (cum < peak)
        assert r["drawdown"] >= 0.0


def test_drawdown_max_is_peak_to_trough(spark, sf_dir):
    rows = QUERIES["q_drawdown"](spark, sf_dir).collect()
    dd = max(r["drawdown"] for r in rows)
    cums = [r["cum_net"] for r in sorted(rows, key=lambda r: r["day"])]
    brute = max(
        (max(cums[: i + 1]) - cums[i]) for i in range(len(cums))
    )
    assert abs(dd - brute) < 1e-9
