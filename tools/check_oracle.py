"""Local differential checker mimicking the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, column names and
an order-insensitive value multiset. Exact string equality first (the goal:
bitwise-identical floats via the DECIMAL-sum policy); falls back to a
tolerance compare only to classify the failure.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cdmx_airquality_etl_spark.schemas import TESTDATA_TABLES  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # full precision
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def approx_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            try:
                fa, fb = float(va), float(vb)
            except ValueError:
                return False
            if not math.isclose(fa, fb, rel_tol=1e-8, abs_tol=1e-8):
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if len(s_rows) == 0:
                print(f"      WARNING: 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ms = frame_to_multiset(s_cols, s_rows)
            md = frame_to_multiset(d_cols, d_rows)
            if ms != md:
                if approx_equal(ms, md):
                    problems.append("values float-close but NOT exact")
                else:
                    problems.append("values mismatch")
                    for i, (ra, rb) in enumerate(zip(ms, md)):
                        if ra != rb:
                            problems.append(f"  first diff row {i}: spark={ra} duck={rb}")
                            break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name} ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
