"""Round-9 ADVICE pins for the oracle tooling.

1. The sharded lsh-planner oracle's piece SQL is DERIVED from the
   committed ``_SQL_SHINGLE_PAIR_CTES`` constant (an inline copy could
   silently validate stale shingle semantics), and refuses to build if
   the injection anchor disappears.
2. Shard predicates use non-negative modulo: with DuckDB's sign-keeping
   ``%`` a negative doc_id would fall out of every piece — a silent
   undercount. Pinned by comparing a g=3 decomposition against the
   trivially-complete g=1 run on a corpus that contains negative ids.
3. The DuckDB memory cap is RAM-aware (min(48GB, RAM/2)) and
   env-overridable, instead of a fixed 48GB that would RAISE the cap on
   small hosts.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)

import _ducklimits  # noqa: E402
import lsh_oracle_sharded as los  # noqa: E402


def _partials(con, g: int) -> dict:
    from cdmx_airquality_etl_spark.operators.dedup import _LSH_PLAN_CONFIGS

    acc = {b: [0, 0, 0, 0] for b, _ in _LSH_PLAN_CONFIGS}
    for i in range(g):
        for j in range(g):
            for bands, n_dup, n_near, pm_dup, pm_near in con.sql(
                los.piece_sql(i, j, g)
            ).fetchall():
                a = acc[bands]
                a[0] += n_dup
                a[1] += n_near
                a[2] += pm_dup
                a[3] += pm_near
    return acc


def test_sharded_pieces_cover_negative_doc_ids():
    base = (
        "the quick brown fox jumps over the lazy dog again and again today"
    )
    rows = []
    # near-identical docs across a sign-mixed id space: every cross pair
    # has high 3-shingle Jaccard, so each contributes to the partials
    for doc_id in (-7, -2, -1, 0, 1, 3, 8):
        rows.append((doc_id, base + f" tail{abs(doc_id) % 2}"))
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")

    one_shot = _partials(con, 1)  # g=1: the single piece sees ALL pairs
    assert any(sum(v) > 0 for v in one_shot.values()), "fixture has no pairs"
    assert _partials(con, 3) == one_shot
    assert _partials(con, 4) == one_shot


def test_piece_sql_derives_from_committed_ctes(monkeypatch):
    from cdmx_airquality_etl_spark.operators import dedup

    # the injected chain contains the committed constant's distinctive
    # shingle expression (not a re-typed copy)
    assert "list_distinct(list_transform" in los.sharded_ctes(0, 0, 2)
    # ...and refuses to build when the anchor text vanishes from dedup.py
    monkeypatch.setattr(
        los, "_SQL_SHINGLE_PAIR_CTES", "tok AS (SELECT 1)", raising=True
    )
    with pytest.raises(RuntimeError, match="injection point"):
        los.sharded_ctes(0, 0, 2)


def test_duck_memory_limit_is_ram_aware(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DUCK_MEM", raising=False)
    lim = _ducklimits.duck_memory_limit()
    gb = int(lim.removesuffix("GB"))
    assert 1 <= gb <= 48
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        total = None
    if total is not None:
        assert gb <= max(1, total // (2 * 1024**3))
    monkeypatch.setenv("SPARK_GRAFT_DUCK_MEM", "3GB")
    assert _ducklimits.duck_memory_limit() == "3GB"


def test_rotating_slice_covers_registry_and_is_deterministic():
    """tools/sample_rotate.py (VERDICT r10 #6): the rotation must be a pure
    function of the round number, and consecutive rounds must tile the
    whole registry — every query sampled at least once per ⌈N/25⌉ rounds."""
    import math
    import sys as _sys
    import os as _os

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    from sample_rotate import ANCHOR_ROUND, SLICE, slice_for_round

    from cdmx_airquality_etl_spark.registry import QUERIES

    names = sorted(QUERIES)
    assert slice_for_round(names, 11) == slice_for_round(names, 11)
    assert slice_for_round(names, ANCHOR_ROUND)[0] == names[0]
    cycle = math.ceil(len(names) / SLICE)
    seen = set()
    for r in range(ANCHOR_ROUND, ANCHOR_ROUND + cycle):
        seen.update(slice_for_round(names, r))
    assert seen == set(names), (
        f"{len(set(names) - seen)} queries never sampled in one cycle"
    )
