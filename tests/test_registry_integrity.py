"""Registry integrity: the driver contract demands every query either carry a
DuckDB oracle or be on the declared rows-only list with a reason — a query
can never silently lose its correctness check."""

from cdmx_airquality_etl_spark.registry import ORACLE_FACTORIES, ORACLES, QUERIES

# The exhaustive rows-only allowlist. Adding a query without an oracle fails
# this test until it is justified here (SURVEY.md §7: only genuinely
# non-SQL-expressible ops qualify).
ROWS_ONLY = {
    "q_multimodal_decode": "stubbed binary decode (build contract) — the "
    "float feature stream has no SQL equivalent; the metadata path is "
    "oracle-checked as q_multimodal_meta",
}
# (q_compression_ratio left this list in round 7: its checkable surface is
# the deterministic fixture-corpus calibration — see operators/udf_surface.)

CHECKED = set(ORACLES) | set(ORACLE_FACTORIES)


def test_every_query_is_checked():
    missing = set(QUERIES) - CHECKED - set(ROWS_ONLY)
    assert not missing, f"queries with neither oracle nor rows-only reason: {missing}"


def test_rows_only_list_is_tight():
    stale = set(ROWS_ONLY) & CHECKED
    assert not stale, f"rows-only entries that now have oracles: {stale}"
    unknown = set(ROWS_ONLY) - set(QUERIES)
    assert not unknown, f"rows-only entries for unregistered queries: {unknown}"


def test_oracle_column_aliases_present():
    # every oracle must alias aggregates (driver compares by column name);
    # cheap proxy: no bare "count(" in a SELECT without AS nearby is hard to
    # parse robustly, so instead pin the invariant that made round 1 pass:
    # oracle text and registry stay non-empty and 1:1 with queries
    assert len(QUERIES) >= 68
    assert set(ORACLES) <= set(QUERIES)
