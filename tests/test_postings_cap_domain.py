"""The capped postings core (_shared_shingle_pairs / _jaccard_pairs) is
exact only while no shingle's document frequency reaches _MAX_POSTINGS —
the cap silently drops pairs beyond that. Through round 10 three registered
oracles rode it and this file pinned the df domain at every swept SF.

Round 11 RETIRED the core from the registered surface: q_dedup_fuzzy and
q_dup_source_matrix moved to adjacency anchors in r9, q_dedup_containment
to the exact prefix filter and q_edit_distance_verify to anchors in r11 —
all cap-free with exact verify stages (coverage proofs on
_anchor_jaccard_pairs / _prefix_containment_pairs; cap-freedom pinned by
test_prefix_containment.test_hot_shingle_beyond_old_cap_loses_nothing).
What remains here:

- a SOURCE-LEVEL guard that no registered query module reaches the capped
  core again (a re-introduction would silently re-create the old
  exactness-only-below-the-cap asymmetry with the uncapped oracles);
- the df-domain pin, kept at the smallest SF only, demoted to documenting
  the LIBRARY function's validity domain (test_dedup_skew.py still
  exercises the cap semantics directly).
"""

import pathlib

import duckdb
import pytest

from cdmx_airquality_etl_spark.operators.dedup import _MAX_POSTINGS

_OPS_DIR = pathlib.Path(__file__).resolve().parents[1] / (
    "cdmx_airquality_etl_spark/operators"
)

# the exact shingle definition the library core uses (q_dedup_fuzzy oracle CTEs)
_MAX_DF_SQL = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM read_parquet(?)
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                      i -> array_to_string(w[i:i+2], ' '))) AS shs
  FROM tok
),
e AS (SELECT doc_id, unnest(shs) AS shingle FROM sh)
SELECT COALESCE(MAX(df), 0)
FROM (SELECT shingle, COUNT(*) AS df FROM e GROUP BY 1)
"""


def test_no_registered_query_rides_the_capped_core():
    """Grep every operator module for call sites of the capped core: only
    dedup.py may contain them (the definitions and the one internal
    composition, _jaccard_pairs → _shared_shingle_pairs), and dedup.py's
    registered queries must not call either — checked by asserting the
    only dedup.py call site is inside _jaccard_pairs itself."""
    for path in sorted(_OPS_DIR.glob("*.py")):
        src = path.read_text()
        calls = [
            ln
            for ln in src.splitlines()
            if ("_shared_shingle_pairs(" in ln or "_jaccard_pairs(" in ln)
            and "_anchor_jaccard_pairs(" not in ln
            and not ln.strip().startswith("def ")
            and not ln.strip().startswith("#")
        ]
        if path.name == "dedup.py":
            assert all("_shared_shingle_pairs(shingled" in ln for ln in calls), (
                f"dedup.py grew a new capped-core call site: {calls} — the "
                "cap trades exactness; registered queries must use the "
                "anchor or prefix-filter plans"
            )
        else:
            assert not calls, (
                f"{path.name} calls the capped postings core: {calls} — "
                "its exactness holds only below _MAX_POSTINGS; use "
                "_anchor_jaccard_pairs or _prefix_containment_pairs"
            )


def test_library_core_df_domain_documented():
    """The library-only cap validity domain, pinned where it's cheap: at
    sf0.001 the max shingle df must sit far below the cap, so any unit
    test composing _jaccard_pairs on driver testdata stays exact."""
    con = duckdb.connect()
    try:
        max_df = con.execute(
            _MAX_DF_SQL, ["/root/testdata/sf0.001/documents.parquet"]
        ).fetchone()[0]
    finally:
        con.close()
    assert max_df < _MAX_POSTINGS, (
        f"max shingle df {max_df} ≥ _MAX_POSTINGS {_MAX_POSTINGS}: the "
        "library capped core is no longer exact on the test corpus"
    )
