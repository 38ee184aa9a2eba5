"""Streaming corpus ingest with incremental dedup: files → AvailableNow
stream → fingerprint anti-join → append. Checks cross-batch dedup,
within-batch dedup, replay idempotency, and agreement with running the same
logic as one batch."""

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdmx_airquality_etl_spark.streaming.corpus_ingest import (
    corpus_ingest_stream,
    dedup_batch_against_corpus,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def _write_batch(spark, dir_, name, rows):
    # append new part-files into the watched directory itself (the file
    # stream source lists files, not nested batch subdirectories)
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dir_)


def test_corpus_ingest_dedups_across_and_within_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: one unique doc + an internal duplicate pair (same normalized
    # content, different whitespace)
    _write_batch(
        spark, src, "b1",
        [(1, "Hello  World"), (2, "hello world"), (3, "unique one")],
    )
    corpus_ingest_stream(spark, src, DOC_SCHEMA, corpus, ckpt)
    got1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 3}  # within-batch dup keeps lowest doc_id

    # batch 2: a cross-batch duplicate of doc 1 + a genuinely new doc
    _write_batch(spark, src, "b2", [(10, "HELLO   world"), (11, "brand new")])
    corpus_ingest_stream(spark, src, DOC_SCHEMA, corpus, ckpt)
    rows = spark.read.parquet(corpus).collect()
    assert {r.doc_id for r in rows} == {1, 3, 11}
    # corpus invariant: fingerprints unique
    fps = [r.fingerprint for r in rows]
    assert len(fps) == len(set(fps))

    # replay: rerunning with the same checkpoint sees no new files → no-op
    corpus_ingest_stream(spark, src, DOC_SCHEMA, corpus, ckpt)
    assert spark.read.parquet(corpus).count() == 3


def test_dedup_batch_helper_is_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "corpus2")
    b = spark.createDataFrame([(1, "aaa"), (2, "bbb")], DOC_SCHEMA)
    dedup_batch_against_corpus(spark, b, corpus).write.mode("append").parquet(corpus)
    # redelivering the identical batch (e.g. after a failed commit) inserts 0
    again = dedup_batch_against_corpus(spark, b, corpus)
    assert again.count() == 0
