"""Tests for the compression-ratio surface (compression_scores per-doc
scorer + q_compression_ratio fixture calibration, mapInPandas) and
export_jsonl_shards (deterministic sharded training-data delivery)."""

import zlib

from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.operators.udf_surface import (
    compression_scores,
    q_compression_ratio,
)
from cdmx_airquality_etl_spark.sinks import export_jsonl_shards


def test_compression_scores_match_direct_zlib(spark, sf_dir):
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    docs = {str(r.doc_id): r.text for r in docs_df.collect()}
    got = {
        r.doc_id: r
        for r in compression_scores(
            docs_df.select(F.col("doc_id").cast("string"), "text"),
            "doc_id",
            "text",
        ).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        r = got[doc_id]
        if text is None:
            assert r.n_bytes is None and r.ratio is None
            continue
        raw = text.encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.n_compressed == len(zlib.compress(raw, 6))
        assert r.ratio == r.n_compressed / r.n_bytes


def test_compression_scores_discriminate_repetition(spark):
    rows = [
        ("1", "spam " * 200),  # highly repetitive → compresses hard
        ("2", " ".join(f"w{i * 7919 % 104729}" for i in range(200))),  # high-entropy
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r.doc_id: r.ratio
        for r in compression_scores(df, "doc_id", "text").collect()
    }
    assert out["1"] < 0.1  # repetitive text crushes
    assert out["2"] > out["1"] * 3  # high-entropy text compresses far worse


def test_compression_ratio_calibration_is_green_and_ordered(spark):
    """The fixture calibration itself: every class fully in its band, and
    the semantic ordering rep < hex < mix holds (a broken compressor
    cannot keep all three flags green)."""
    rows = {r["class"]: r for r in q_compression_ratio(spark, "unused").collect()}
    assert set(rows) == {"rep", "hex", "mix"}
    for cls, r in rows.items():
        assert r.n_docs == 64
        assert r.n_docs_in_band == 64, cls
        assert r.mean_ratio_in_band == 1, cls


def test_export_jsonl_shards_roundtrip_and_stability(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    n = docs.count()
    path = str(tmp_path / "shards")
    manifest = export_jsonl_shards(docs, path, n_shards=4, key_col="doc_id")
    assert sum(c for _, c in manifest) == n
    assert {s for s, _ in manifest} <= {0, 1, 2, 3}

    back = spark.read.schema("doc_id long, lang string, source string").json(
        f"{path}/shard=*/"
    )
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n

    # shard assignment is a pure function of the key: a re-export of the
    # same frame under a different input partitioning lands identically
    manifest2 = export_jsonl_shards(
        docs.repartition(7), str(tmp_path / "shards2"), n_shards=4, key_col="doc_id"
    )
    assert manifest == manifest2

    # one file per shard directory (repartition-by-shard before partitionBy)
    import glob

    for s, _ in manifest:
        files = glob.glob(f"{path}/shard={s}/part-*.json")
        assert len(files) == 1, files
