"""q_udf_normalize's oracle promotion contract: the DuckDB strip_accents
twin (_SQL_NFKD_LATIN) equals the exact Python NFKD fold on the LATIN-SCRIPT
domain — and the driver corpus sits inside that domain (pure ASCII at every
SF, asserted here so a regenerated corpus that leaves the domain fails
loudly instead of silently diverging). The known divergence cases — NFKD
*compatibility* decompositions that strip_accents doesn't perform — are
pinned as negative examples documenting exactly where the oracle's validity
ends."""

import duckdb
import pytest

from cdmx_airquality_etl_spark.functions.text import _nfkd_fold
from cdmx_airquality_etl_spark.operators.udf_surface import _SQL_NFKD_LATIN

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _sql_fold(s: str) -> str:
    con = duckdb.connect()
    try:
        return con.execute(
            f"SELECT {_SQL_NFKD_LATIN} FROM (SELECT ? AS text)", [s]
        ).fetchone()[0]
    finally:
        con.close()


@pytest.mark.parametrize(
    "s",
    [
        "Hello World",
        "  trimmed  edges  ",
        "Árbol ñoño übermäßig-frei café",  # precomposed Latin accents
        "ÁÉÍÓÚ àèìòù âêîôû äëïöü ãõ åç ÑÝ",
        "tabs\tand\nnewlines stay",  # NFKD fold replaces only spaces
        "UPPER lower MiXeD 123 !@#",
        "",
    ],
)
def test_sql_twin_matches_nfkd_on_latin_domain(s):
    assert _sql_fold(s) == _nfkd_fold(s.strip())


@pytest.mark.parametrize(
    ("s", "why"),
    [
        ("oﬃce ﬁle", "NFKD decomposes ligatures to letters; SQL drops them"),
        ("a b", "NFKD folds NBSP to a space; SQL drops it"),
        ("step①done", "NFKD decomposes circled digits; SQL drops them"),
    ],
)
def test_known_divergence_domain(s, why):
    """Outside Latin script the two folds genuinely differ — these are the
    concrete counterexamples that bound the oracle's domain (the corpus
    assertion below keeps the driver inside it)."""
    assert _sql_fold(s) != _nfkd_fold(s.strip()), why


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corpus_stays_in_oracle_domain(sf_dir):
    con = duckdb.connect()
    try:
        n = con.execute(
            "SELECT count(*) FROM read_parquet(?) "
            "WHERE regexp_matches(text, '[^\\x00-\\x7F]')",
            [f"{sf_dir}/documents.parquet"],
        ).fetchone()[0]
    finally:
        con.close()
    assert n == 0, (
        f"{sf_dir}: {n} non-ASCII documents — corpus left the Latin-ASCII "
        "domain where the q_udf_normalize oracle is exact; re-verify the "
        "strip_accents twin before trusting the oracle row"
    )
