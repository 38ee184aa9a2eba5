"""Generate LOCAL large-scale-factor twins of the driver's testdata tables
for scaling-curve measurement (VERDICT r6 ask #1).

/root/testdata is read-only and capped at sf0.1; proving the "stays ~linear
at 100 TB" design claims needs points ABOVE that. This script regenerates
the same star schema at arbitrary sf from the measured distributions of the
driver's data (profiled 2026-08-15 against sf0.01/sf0.1):

- documents: 50_000*sf rows; 31-word vocab; 10-100 words/doc uniform;
  langs en .41 / zh .15 / es .15 / fr .15 / de .14; 20 uniform sources;
  ~0.16% of docs are exact copies of an earlier doc (8 dup pairs / 5k docs).
- embeddings: ~2000*(sf/0.1)^0.602 rows (matches the driver's 500@0.01 →
  2000@0.1 sub-linear law); 64-dim UNIT vectors, isotropic random (measured
  intra-label cosine ≈ inter-label ≈ 0 — labels are arbitrary), 10 labels.
- orders: 1.5M*sf; custkey U[0, 150k*sf); status F/O/P; totalprice
  U[1000, 500000]; orderdate U[1995-01-01, 2001-08-01]; 5 priorities.
- lineitem: ~6M*sf via per-order max(1, Poisson(4)) lines; partkey
  U[0, 200k*sf); suppkey U[0, 10k*sf); shipdate = orderdate + U[1, 95]d.
- events: 1M*sf; user U[0, 15k*sf); ts U over 2024-01; 5 uniform types;
  value half-normal-ish scaled; props JSON {"k": int}.

All generation is numpy, vectorized, deterministic (seed = 42 ⊕ table ⊕ sf).
Schemas byte-match the driver's (int64/int32/double/timestamp[us]/
list<float>), so load_table and every oracle run unchanged.

Usage: python tools/gen_scale_data.py 0.3 1 [--out /root/repo/.scaledata]
"""

from __future__ import annotations

import argparse
import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
US_DAY = 86_400 * 1_000_000


def _rng(table: str, sf: float) -> np.random.Generator:
    return np.random.default_rng(zlib.crc32(f"42~{table}~{sf}".encode()))


def gen_documents(sf: float) -> pa.Table:
    rng = _rng("documents", sf)
    n = int(round(50_000 * sf))
    n_words = rng.integers(10, 101, n)
    offsets = np.concatenate([[0], np.cumsum(n_words)])
    flat = VOCAB[rng.integers(0, len(VOCAB), offsets[-1])]
    texts = [" ".join(flat[offsets[i]:offsets[i + 1]]) for i in range(n)]
    # exact-dup injection at the driver's measured rate (8 pairs / 5000)
    dup_mask = rng.random(n) < 0.0016
    for i in np.flatnonzero(dup_mask):
        if i > 0:
            texts[i] = texts[rng.integers(0, i)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(LANGS, n, p=LANG_P), pa.string()),
            "source": pa.array(
                [f"src{i}" for i in rng.integers(0, 20, n)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(sf: float) -> pa.Table:
    rng = _rng("embeddings", sf)
    # the driver's own sub-linear law: 500 @ sf0.01, 2000 @ sf0.1
    n = int(round(2000 * (sf / 0.1) ** 0.60206))
    vecs = rng.standard_normal((n, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def gen_orders(sf: float) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    rng = _rng("orders", sf)
    n = int(round(1_500_000 * sf))
    n_cust = int(round(150_000 * sf))
    base = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    span_days = (
        np.datetime64("2001-08-01") - np.datetime64("1995-01-01")
    ).astype(int)
    odate = base + rng.integers(0, span_days + 1, n) * US_DAY
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["F", "O", "P"])[rng.integers(0, 3, n)], pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000.0, 500_000.0, n), 2), pa.float64()
            ),
            "o_orderdate": pa.array(odate, pa.timestamp("us")),
            "o_orderpriority": pa.array(
                np.array(
                    [
                        "1-URGENT",
                        "2-HIGH",
                        "3-MEDIUM",
                        "4-NOT SPECIFIED",
                        "5-LOW",
                    ]
                )[rng.integers(0, 5, n)],
                pa.string(),
            ),
        }
    )
    return t, np.arange(n), odate


def gen_lineitem(
    sf: float, orderkeys: np.ndarray, odate: np.ndarray, skew: bool = False
) -> pa.Table:
    rng = _rng("lineitem", sf)
    n_part = int(round(200_000 * sf))
    n_supp = int(round(10_000 * sf))
    k = np.maximum(1, rng.poisson(4.0, len(orderkeys)))
    if skew:
        # celebrity-key variant: ONE randomly-placed order owns ~80% of
        # all lines (k[hot] = 4 * sum(k) ≈ 4/5 of the inflated total) —
        # hot-reducer work must DOMINATE the stage wall-clock for the
        # probe to show the funnel (a milder 1% hot key measures nothing
        # at local[32]: 100k-row reducers finish in noise). NOTE: this
        # quintuples the lineitem row count vs the 6M*sf law, so sweep
        # row-count laws do NOT hold for -skew dirs.
        hot = rng.choice(len(orderkeys), size=1, replace=False)
        k[hot] = int(4 * k.sum())  # ONE order owns ~80% of all lines
    lok = np.repeat(orderkeys, k)
    lod = np.repeat(odate, k)
    n = len(lok)
    linenumber = (
        np.arange(n) - np.repeat(np.concatenate([[0], np.cumsum(k)[:-1]]), k) + 1
    )
    ship = lod + rng.integers(1, 96, n) * US_DAY
    return pa.table(
        {
            "l_orderkey": pa.array(lok, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
            "l_linenumber": pa.array(linenumber.astype(np.int32), pa.int32()),
            "l_quantity": pa.array(
                rng.integers(1, 51, n).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105_000.0, n), 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.uniform(0.0, 0.10, n), 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.uniform(0.0, 0.08, n), 2), pa.float64()
            ),
            "l_returnflag": pa.array(
                np.array(["R", "A", "N"])[rng.integers(0, 3, n)], pa.string()
            ),
            "l_linestatus": pa.array(
                np.array(["F", "O"])[rng.integers(0, 2, n)], pa.string()
            ),
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        }
    )


def gen_events(sf: float, skew: bool = False) -> pa.Table:
    rng = _rng("events", sf)
    n = int(round(1_000_000 * sf))
    n_users = int(round(15_000 * sf))
    if skew:
        # zipf(1.3) user activity: the busiest user owns a few percent of
        # all events — sessionize/retention per-user state under hot keys
        u = rng.zipf(1.3, n)
        user_id = (u - 1) % n_users
        base = (
            np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
        )
        ts = base + rng.integers(0, 30 * US_DAY, n)
        return pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(user_id.astype(np.int64), pa.int64()),
                "event_type": pa.array(
                    np.array(["signup", "click", "view", "purchase", "error"])[
                        rng.integers(0, 5, n)
                    ],
                    pa.string(),
                ),
                "value": pa.array(
                    np.round(np.abs(rng.standard_normal(n)) * 70.0, 2),
                    pa.float64(),
                ),
                "props": pa.array(
                    [json.dumps({"k": int(v)}) for v in rng.integers(0, 100, n)],
                    pa.string(),
                ),
            }
        )
    base = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ts = base + rng.integers(0, 30 * US_DAY, n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(
                np.array(["signup", "click", "view", "purchase", "error"])[
                    rng.integers(0, 5, n)
                ],
                pa.string(),
            ),
            "value": pa.array(
                np.round(np.abs(rng.standard_normal(n)) * 70.0, 2), pa.float64()
            ),
            "props": pa.array(
                [json.dumps({"k": int(v)}) for v in rng.integers(0, 100, n)],
                pa.string(),
            ),
        }
    )


_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_PADJ = ["large", "hot", "blue", "red", "small", "green", "dim", "shiny"]
_PNOUN = ["ring", "bolt", "screw", "nut", "washer", "pin", "clip", "rod"]


def gen_dims(sf: float) -> dict[str, pa.Table]:
    rng = _rng("dims", sf)
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
            "r_name": pa.array(_REGIONS, pa.string()),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
            "n_regionkey": pa.array(
                (np.arange(25) % 5).astype(np.int32), pa.int32()
            ),
        }
    )
    n_cust = int(round(150_000 * sf))
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, n_cust), 2), pa.float64()
            ),
            "c_mktsegment": pa.array(
                np.array(_SEGMENTS)[rng.integers(0, 5, n_cust)], pa.string()
            ),
        }
    )
    n_supp = int(round(10_000 * sf))
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()
            ),
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, n_supp), 2), pa.float64()
            ),
        }
    )
    n_part = int(round(200_000 * sf))
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": pa.array(
                [
                    f"{_PADJ[i % len(_PADJ)]} {_PNOUN[(i // 8) % len(_PNOUN)]}"
                    for i in rng.integers(0, 64, n_part)
                ],
                pa.string(),
            ),
            "p_brand": pa.array(
                [f"Brand#{i}" for i in rng.integers(1, 26, n_part)], pa.string()
            ),
            "p_type": pa.array(
                np.array(_PTYPES)[rng.integers(0, len(_PTYPES), n_part)],
                pa.string(),
            ),
            "p_size": pa.array(
                rng.integers(1, 51, n_part).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                np.round(900.0 + np.arange(n_part) * 0.1 % 1000, 2),
                pa.float64(),
            ),
        }
    )
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
    }


def generate(sf: float, out_root: str, skew: bool = False) -> None:
    out = os.path.join(out_root, f"sf{sf:g}" + ("-skew" if skew else ""))
    os.makedirs(out, exist_ok=True)
    orders, okeys, odate = gen_orders(sf)
    tables = {
        "documents": gen_documents(sf),
        "embeddings": gen_embeddings(sf),
        "orders": orders,
        "lineitem": gen_lineitem(sf, okeys, odate, skew=skew),
        "events": gen_events(sf, skew=skew),
        **gen_dims(sf),
    }
    for name, t in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(t, path, compression="snappy")
        print(f"sf{sf:g} {name}: {t.num_rows} rows -> {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sfs", nargs="+", type=float)
    ap.add_argument("--out", default="/root/repo/.scaledata")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="celebrity-key lineitem + zipf(1.3) event users; dir gets "
        "an -skew suffix",
    )
    args = ap.parse_args()
    for sf in args.sfs:
        generate(sf, args.out, skew=args.skew)
