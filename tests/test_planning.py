"""Semantics tests for planning.py: compaction binning, skyline,
Hamilton apportionment, weighted median."""

import math

from cdmx_airquality_etl_spark.operators.planning import (
    _COMPACT_TARGET_ROWS,
    _QUOTA_BUDGET,
)
from cdmx_airquality_etl_spark.registry import QUERIES
from cdmx_airquality_etl_spark.sources.parquet import load_table


def test_compaction_plan_matches_manual(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    files: dict[tuple, int] = {}
    for r in ev:
        files[(r["ts"].strftime("%Y-%m-%d"), r["ts"].hour)] = (
            files.get((r["ts"].strftime("%Y-%m-%d"), r["ts"].hour), 0) + 1
        )
    expected: dict[tuple, list] = {}
    by_day: dict[str, list] = {}
    for (day, hour), n in files.items():
        by_day.setdefault(day, []).append((hour, n))
    for day, fs in by_day.items():
        fs.sort()
        prefix = 0
        for hour, n in fs:
            b = prefix // _COMPACT_TARGET_ROWS
            expected.setdefault((day, b), []).append(n)
            prefix += n
    got = {
        (r["part_day"], r["bin_id"]): r
        for r in QUERIES["q_compaction_plan"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, ns in expected.items():
        assert got[k]["n_files"] == len(ns)
        assert got[k]["total_rows"] == sum(ns)
        assert got[k]["needs_compaction"] == (len(ns) > 1)


def test_pareto_frontier_is_exact_skyline(spark, sf_dir):
    parts = [
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in parts
        )

    expected = {p[0] for p in parts if not dominated(p)}
    got = {r["p_partkey"] for r in QUERIES["q_pareto_frontier"](spark, sf_dir).collect()}
    assert got == expected


def test_quota_allocation_sums_and_quota_property(spark, sf_dir):
    rows = QUERIES["q_quota_allocation"](spark, sf_dir).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    assert sum(r["alloc"] for r in rows) == _QUOTA_BUDGET
    for r in rows:
        exact = r["n_docs"] * _QUOTA_BUDGET / total_docs
        # Hamilton satisfies the quota rule: floor(q) <= alloc <= ceil(q)
        assert math.floor(exact) <= r["alloc"] <= math.ceil(exact)


def test_weighted_median_matches_manual(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], r["l_orderkey"], r["l_linenumber"],
             round(r["l_quantity"] * 100))
        )
    got = {r["l_returnflag"]: r for r in QUERIES["q_weighted_median"](spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for flag, rows in groups.items():
        rows.sort()
        tw = sum(w for *_, w in rows)
        cw = 0
        med = None
        for price, _, _, w in rows:
            cw += w
            if 2 * cw >= tw:
                med = price
                break
        assert got[flag]["total_weight_cq"] == tw
        assert got[flag]["weighted_median_price"] == med
