"""The shingle-postings oracles (q_dedup_fuzzy, q_dedup_containment,
q_dup_source_matrix) are exact only while no shingle's document frequency
reaches _MAX_POSTINGS: the Spark plans cap postings lists (the quadratic
skew guard), their DuckDB oracles build pairs UNCAPPED, and the two agree
precisely because the cap currently prunes nothing. That asymmetry was
silent — a regenerated corpus with a stop-phrase shingle (df ≥ cap) would
hash-mismatch with no hint why. Pin the domain at every SF the sweeps run,
with headroom so drift is visible before it breaks (observed max df: 7 at
sf0.01, 25 at sf0.1; cap 1000)."""

import duckdb
import pytest

from cdmx_airquality_etl_spark.operators.dedup import _MAX_POSTINGS

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# the exact shingle definition the oracles use (q_dedup_fuzzy oracle CTEs)
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


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_max_shingle_df_stays_under_postings_cap(sf_dir):
    con = duckdb.connect()
    try:
        max_df = con.execute(
            _MAX_DF_SQL, [f"{sf_dir}/documents.parquet"]
        ).fetchone()[0]
    finally:
        con.close()
    assert max_df < _MAX_POSTINGS, (
        f"{sf_dir}: max shingle df {max_df} ≥ _MAX_POSTINGS "
        f"{_MAX_POSTINGS} — the Spark postings cap now prunes pairs the "
        "uncapped DuckDB oracles still count; encode the cap into the "
        "oracle SQL (or raise it) before trusting "
        "q_dedup_fuzzy/q_dedup_containment/q_dup_source_matrix rows"
    )
    # early-warning headroom: halfway to the cap is close enough to act
    assert max_df < _MAX_POSTINGS // 2, (
        f"{sf_dir}: max shingle df {max_df} is within 2x of the postings "
        "cap — corpus drift is approaching the oracle-validity boundary"
    )
