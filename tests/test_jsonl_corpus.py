"""JSONL corpus source: declared-schema permissive read with corrupt-line
quarantine (sources/jsonl_corpus.py). Generalizes the reference's
malformed-row skip-and-log discipline (scrapper.py:150-168) to the LLM
corpus interchange format."""

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdmx_airquality_etl_spark.sources.jsonl_corpus import (
    corpus_schema_with_corrupt,
    quarantine_report,
    read_jsonl_corpus,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

GOOD_LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "hola mundo", "lang": "es"}',
    '{"doc_id": 3, "text": "bonjour", "lang": "fr"}',
]
BAD_LINES = [
    '{"doc_id": 4, "text": "truncated...',  # cut mid-string
    "not json at all",
    '{"doc_id": "five" "text": missing-comma}',
]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        "\n".join(GOOD_LINES[:2] + BAD_LINES[:2]) + "\n"
    )
    (p / "part-1.jsonl").write_text(
        "\n".join([GOOD_LINES[2], BAD_LINES[2]]) + "\n"
    )
    return str(p)


def test_split_routes_every_line_exactly_once(spark, jsonl_dir):
    good, quarantine = read_jsonl_corpus(spark, jsonl_dir, DOC_SCHEMA)
    assert good.count() == len(GOOD_LINES)
    assert quarantine.count() == len(BAD_LINES)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 3]
    # the corrupt channel never leaks into the good frame
    assert "_corrupt_record" not in good.columns
    # quarantine preserves the raw evidence verbatim
    raws = {r["raw_line"] for r in quarantine.collect()}
    assert raws == set(BAD_LINES)


def test_type_mismatch_is_null_not_quarantine(spark, tmp_path):
    # PERMISSIVE semantics: a well-formed JSON line with a wrong-typed
    # field yields NULL for that field (quality-gate territory), not a
    # quarantined line
    p = tmp_path / "c2"
    p.mkdir()
    (p / "x.jsonl").write_text('{"doc_id": "not-a-number", "text": "t", "lang": "en"}\n')
    good, quarantine = read_jsonl_corpus(spark, str(p), DOC_SCHEMA)
    rows = good.collect()
    assert quarantine.count() == 0 or good.count() + quarantine.count() == 1
    if rows:
        assert rows[0]["doc_id"] is None
        assert rows[0]["text"] == "t"


def test_quarantine_report_ratio(spark, jsonl_dir):
    good, quarantine = read_jsonl_corpus(spark, jsonl_dir, DOC_SCHEMA)
    row = quarantine_report(good, quarantine).collect()[0]
    assert row["n_good"] == 3 and row["n_quarantined"] == 3
    assert row["quarantine_ratio"] == pytest.approx(0.5)


def test_schema_helper_is_idempotent():
    s1 = corpus_schema_with_corrupt(DOC_SCHEMA)
    s2 = corpus_schema_with_corrupt(s1)
    assert s1 == s2
    assert s1.fieldNames().count("_corrupt_record") == 1
