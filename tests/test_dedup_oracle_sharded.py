"""Pins for tools/dedup_oracle_sharded.py (VERDICT r10 #5's sf10 oracle
path for the t = 0.5 anchor family):

1. The G×G decomposition of each sharded oracle equals the trivially
   complete g=1 run on a sign-mixed doc-id corpus (non-negative modulo —
   DuckDB's sign-keeping ``%`` would silently drop negative ids).
2. Piece SQL executes the COMMITTED oracle texts (registry.ORACLES) and
   refuses to build when an injection anchor drifts.
3. --matrix-from-pairs (the grouped join over the verified fuzzy pair
   set) equals the sharded matrix oracle — the two oracles share pair
   semantics and threshold, so the derivation is exact.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import dedup_oracle_sharded as dos  # noqa: E402


def _fixture_con():
    base = (
        "the quick brown fox jumps over the lazy dog again and again today"
    )
    rows = []
    # near-identical docs across a sign-mixed id space (every cross pair
    # is a near-dup at both thresholds) plus two singleton-ish outliers
    for doc_id in (-7, -2, -1, 0, 1, 3, 8):
        rows.append((doc_id, base + f" tail{abs(doc_id) % 2}", f"s{doc_id % 3}"))
    rows.append((20, "completely different text with no overlap at all here", "s0"))
    con = duckdb.connect()
    con.register(
        "docs_src", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    return con


def _sharded(con, piece_sql, g: int) -> list:
    rows = []
    for i in range(g):
        for j in range(g):
            rows.extend(con.sql(piece_sql(i, j, g)).fetchall())
    return sorted(rows)


@pytest.mark.parametrize(
    "piece_sql",
    [
        dos.fuzzy_piece_sql,
        dos.weighted_piece_sql,
        dos.containment_piece_sql,
        dos.matrix_piece_sql,
    ],
    ids=["fuzzy", "weighted", "containment", "matrix"],
)
def test_decomposition_equals_one_shot_on_signed_ids(piece_sql):
    con = _fixture_con()
    one = _sharded(con, piece_sql, 1)  # g=1: the single piece sees ALL pairs
    assert one, "fixture produced no qualifying pairs"
    if piece_sql is dos.matrix_piece_sql:
        # counts are per-piece partials for the matrix — sum before compare
        def total(rows):
            acc = {}
            for sa, sb, n in rows:
                acc[(sa, sb)] = acc.get((sa, sb), 0) + n
            return sorted((sa, sb, n) for (sa, sb), n in acc.items())

        assert total(_sharded(con, piece_sql, 3)) == total(one)
    else:
        assert _sharded(con, piece_sql, 3) == one


def test_injection_guards_raise_on_anchor_drift():
    with pytest.raises(RuntimeError, match="anchor"):
        dos._inject("SELECT 1", "GROUP BY 1, 2, 3, 4", "WHERE x")
    # doubled anchor is as much drift as a missing one
    with pytest.raises(RuntimeError, match="anchor"):
        dos._inject(
            "GROUP BY 1, 2, 3, 4 ... GROUP BY 1, 2, 3, 4",
            "GROUP BY 1, 2, 3, 4",
            "WHERE x",
        )


def test_piece_sql_executes_committed_oracle_texts():
    from cdmx_airquality_etl_spark.registry import ORACLES

    # distinctive committed-oracle text survives injection (derivation,
    # not a re-typed copy) and the shard predicate is the pmod form
    sql = dos.fuzzy_piece_sql(1, 2, 3)
    assert "list_distinct(list_transform" in sql
    assert "((a.doc_id % 3) + 3) % 3 = 1" in sql
    assert "((b.doc_id % 3) + 3) % 3 = 2" in sql
    # weighted injects BOTH the wshared join and the (unused) pairs CTE
    wsql = dos.weighted_piece_sql(0, 0, 2)
    assert wsql.count("((a.doc_id % 2) + 2) % 2 = 0") == 2
    # the closure tail is lifted from the committed clusters oracle
    assert "is_representative" in ORACLES["q_dedup_text_clusters"]
    assert "verified_pairs" in dos.clusters_closure_sql()
    assert "reach(node, r)" in dos.clusters_closure_sql()


def test_clusters_closure_over_sharded_pairs_equals_one_shot():
    """ADVICE r11 #4: the clusters path (clusters_closure_sql re-rooted on
    verified_pairs) was previously pinned only by text presence — a
    re-rooting bug (va/vb column drift vs the committed edges CTE) would
    have passed the tests and surfaced mid-sf10-run.  Execute both sides
    on the fixture: closure over the sharded-verified fuzzy pair set must
    equal the committed one-shot q_dedup_text_clusters oracle."""
    from cdmx_airquality_etl_spark.registry import ORACLES

    con = _fixture_con()
    one_shot = sorted(con.sql(ORACLES["q_dedup_text_clusters"]).fetchall())
    assert one_shot, "fixture produced no clusters"

    pairs = _sharded(con, dos.fuzzy_piece_sql, 3)
    con.sql("CREATE TEMP TABLE verified_pairs (va BIGINT, vb BIGINT)")
    con.executemany(
        "INSERT INTO verified_pairs VALUES (?, ?)",
        [(a, b) for a, b, *_ in pairs],
    )
    closure = sorted(con.sql(dos.clusters_closure_sql()).fetchall())
    assert closure == one_shot


def test_matrix_from_pairs_equals_sharded_matrix():
    con = _fixture_con()
    pairs = _sharded(con, dos.fuzzy_piece_sql, 3)
    con.sql("CREATE TEMP TABLE vp_matrix (da BIGINT, db BIGINT)")
    con.executemany(
        "INSERT INTO vp_matrix VALUES (?, ?)", [(a, b) for a, b, _ in pairs]
    )
    derived = sorted(
        con.sql(
            """
            SELECT LEAST(sa.source, sb.source), GREATEST(sa.source, sb.source),
                   COUNT(*)
            FROM vp_matrix p
            JOIN documents sa ON sa.doc_id = p.da
            JOIN documents sb ON sb.doc_id = p.db
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    acc = {}
    for sa, sb, n in _sharded(con, dos.matrix_piece_sql, 3):
        acc[(sa, sb)] = acc.get((sa, sb), 0) + n
    assert derived == sorted((sa, sb, n) for (sa, sb), n in acc.items())
