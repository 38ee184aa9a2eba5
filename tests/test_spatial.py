"""Semantics tests for the spatial-grid batch (operators/spatial.py):
the cell-bounded plans must agree with brute-force Python over the same
hashed coordinates."""

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.spatial import _CELL, _GRID, _RADIUS2
from cdmx_airquality_etl_spark.registry import QUERIES


def _pts(sf_dir):
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    return {
        int(k): (h(f"x|{int(k)}") % _GRID, h(f"y|{int(k)}") % _GRID)
        for k in cust["c_custkey"]
    }


def test_grid_join_complete_and_exact(spark, sf_dir):
    rows = {(r["id_a"], r["id_b"]): r["dist2"] for r in QUERIES["q_spatial_grid_join"](spark, sf_dir).collect()}
    pts = _pts(sf_dir)
    ids = sorted(pts)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= _RADIUS2:
                brute[(a, b)] = d2
    # radius < cell width -> the 3x3 neighborhood plan is COMPLETE
    assert rows == brute
    assert rows, "the hashed corpus must produce at least one close pair"


def test_density_conserves_mass(spark, sf_dir):
    rows = QUERIES["q_spatial_density"](spark, sf_dir).collect()
    pts = _pts(sf_dir)
    cells = defaultdict(int)
    for x, y in pts.values():
        cells[(x // _CELL, y // _CELL)] += 1
    assert sum(r["n"] for r in rows) == len(pts)
    for r in rows:
        want = sum(
            cells.get((r["cx"] + dx, r["cy"] + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        assert r["neighborhood_n"] == want
        assert r["neighborhood_n"] >= r["n"]


def test_nearest_is_true_nn_within_neighborhood(spark, sf_dir):
    rows = {r["id"]: r for r in QUERIES["q_spatial_nearest"](spark, sf_dir).collect()}
    pts = _pts(sf_dir)
    cells = defaultdict(list)
    for k, (x, y) in pts.items():
        cells[(x // _CELL, y // _CELL)].append(k)
    for k, (x, y) in list(pts.items())[:200]:
        cx, cy = x // _CELL, y // _CELL
        cand = [
            o
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for o in cells.get((cx + dx, cy + dy), [])
            if o != k
        ]
        if not cand:
            assert k not in rows
            continue
        best = min(
            cand,
            key=lambda o: ((pts[o][0] - x) ** 2 + (pts[o][1] - y) ** 2, o),
        )
        r = rows[k]
        assert r["nn_id"] == best
        assert r["dist2"] == (pts[best][0] - x) ** 2 + (pts[best][1] - y) ** 2
