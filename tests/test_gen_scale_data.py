"""The scale-data generator must stay schema- and shape-compatible with the
driver's testdata: the scaling sweep's claims are only transferable if the
generated twins exercise the same operator paths (same column types, same
key-range laws, same corpus character). Pure pyarrow/duckdb — no Spark."""

import os
import sys

import duckdb
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_scale_data import generate  # noqa: E402

REAL = "/root/testdata/sf0.01"
TABLES = [
    "documents", "embeddings", "orders", "lineitem", "events",
    "region", "nation", "customer", "supplier", "part",
]


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scaledata"))
    generate(0.01, root)
    return os.path.join(root, "sf0.01")


def test_schemas_match_driver_testdata(gen_dir):
    for t in TABLES:
        real = pq.read_schema(f"{REAL}/{t}.parquet")
        fake = pq.read_schema(f"{gen_dir}/{t}.parquet")
        for field in real:
            got = fake.field(field.name)
            assert got.type == field.type, (t, field.name, field.type, got.type)
        assert real.names == fake.names, t


def test_row_counts_follow_the_sf_laws(gen_dir):
    con = duckdb.connect()

    def n(d, t):
        return con.execute(f"SELECT count(*) FROM '{d}/{t}.parquet'").fetchone()[0]

    assert n(gen_dir, "documents") == 500
    assert n(gen_dir, "embeddings") == 500  # the driver's sub-linear law
    assert n(gen_dir, "orders") == 15000
    assert n(gen_dir, "events") == 10000
    assert abs(n(gen_dir, "lineitem") - 60000) < 3000  # Poisson(4) lines/order
    assert n(gen_dir, "supplier") == 100 and n(gen_dir, "part") == 2000


def test_corpus_character_matches(gen_dir):
    con = duckdb.connect()
    # same 31-word vocabulary, same word-count range, nonzero dup tail
    vocab = con.execute(
        f"SELECT count(DISTINCT w) FROM (SELECT unnest(string_split(text,' ')) w "
        f"FROM '{gen_dir}/documents.parquet')"
    ).fetchone()[0]
    assert vocab == 31
    lo, hi = con.execute(
        f"SELECT min(length(string_split(text,' '))), "
        f"max(length(string_split(text,' '))) FROM '{gen_dir}/documents.parquet'"
    ).fetchone()
    assert lo >= 10 and hi <= 100
    assert con.execute(
        f"SELECT count(*) FROM '{gen_dir}/documents.parquet' "
        "WHERE n_chars <> length(text)"
    ).fetchone()[0] == 0


def test_determinism(gen_dir, tmp_path):
    generate(0.01, str(tmp_path))
    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        a = con.execute(
            f"SELECT md5(string_agg(row::VARCHAR, '|' ORDER BY row::VARCHAR)) "
            f"FROM (SELECT * FROM '{gen_dir}/{t}.parquet') row"
        ).fetchone()[0]
        b = con.execute(
            f"SELECT md5(string_agg(row::VARCHAR, '|' ORDER BY row::VARCHAR)) "
            f"FROM (SELECT * FROM '{tmp_path}/sf0.01/{t}.parquet') row"
        ).fetchone()[0]
        assert a == b, t
