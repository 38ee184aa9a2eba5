"""Tests for q_compression_ratio (zlib quality signal, mapInPandas) and
export_jsonl_shards (deterministic sharded training-data delivery)."""

import zlib

from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.operators.udf_surface import q_compression_ratio
from cdmx_airquality_etl_spark.sinks import export_jsonl_shards


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(20)
        .collect()
    }
    got = {
        r.doc_id: r
        for r in q_compression_ratio(spark, sf_dir).collect()
        if r.doc_id in docs
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


def test_compression_ratio_discriminates_repetition(spark):
    rows = [
        (1, "spam " * 200),  # highly repetitive → compresses hard
        (2, " ".join(f"w{i * 7919 % 104729}" for i in range(200))),  # high-entropy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    )
    import cdmx_airquality_etl_spark.operators.udf_surface as mod

    # reuse the operator's inner mapInPandas by writing a temp parquet dir
    # shaped like the documents table
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        (
            df.select(
                "doc_id",
                "text",
                "lang",
                F.lit("srcX").alias("source"),
                F.length("text").cast("long").alias("n_chars"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/documents.parquet")
        )
        out = {r.doc_id: r.ratio for r in mod.q_compression_ratio(spark, d).collect()}
    assert out[1] < 0.1  # repetitive text crushes
    assert out[2] > out[1] * 3  # high-entropy text compresses far worse


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
