"""ST-DRIFT tests: the monitor's distance is zero against itself, maximal
for a disjoint distribution, flags an engineered single-language batch,
and the streamed form appends one verdict row per micro-batch."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdmx_airquality_etl_spark.sources.parquet import load_table
from cdmx_airquality_etl_spark.streaming.drift import (
    batch_drift,
    category_profile,
    drift_monitor_stream,
    read_drift_log,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_profile_is_a_distribution(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    prof = category_profile(docs, "lang").collect()
    assert prof
    assert sum(r["frac"] for r in prof) == pytest.approx(1.0)
    assert all(r["frac"] > 0 for r in prof)


def test_drift_zero_against_self_and_two_for_disjoint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ref = category_profile(docs, "lang")
    zero = batch_drift(docs, ref, "lang").collect()[0]
    assert zero["l1_distance"] == pytest.approx(0.0)
    assert zero["n_rows"] == docs.count()
    disjoint = docs.selectExpr(
        "doc_id", "text", "concat('zz-', lang) AS lang", "source", "n_chars"
    )
    two = batch_drift(disjoint, ref, "lang").collect()[0]
    assert two["l1_distance"] == pytest.approx(2.0)


def test_single_language_batch_drifts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ref = category_profile(docs, "lang")
    top = docs.groupBy("lang").count().orderBy("count", ascending=False).first()
    skewed = docs.filter(docs.lang == top["lang"])
    d = batch_drift(skewed, ref, "lang").collect()[0]["l1_distance"]
    # the batch holds 100% of one language: distance is 2*(1 - its ref share)
    ref_share = {r["key"]: r["frac"] for r in ref.collect()}[top["lang"]]
    assert d == pytest.approx(2.0 * (1.0 - ref_share))


def test_drift_monitor_stream_verdicts(spark, sf_dir, tmp_path):
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: uniform head slice (mild drift); batch 1: single-language
    pq.write_table(docs.slice(0, 300), f"{src}/part-0.parquet")
    sdocs = load_table(spark, sf_dir, "documents")
    top = sdocs.groupBy("lang").count().orderBy("count", ascending=False).first()
    sdocs.filter(sdocs.lang == top["lang"]).limit(200).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "skew"))
    import glob
    import shutil

    part = glob.glob(str(tmp_path / "skew" / "part-*.parquet"))[0]
    shutil.copy(part, f"{src}/part-1.parquet")

    ref = category_profile(sdocs, "lang")
    out = str(tmp_path / "verdicts")
    q = drift_monitor_stream(
        spark, str(src), DOC_SCHEMA, ref, "lang", out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = {r["batch_id"]: r for r in read_drift_log(spark, out).collect()}
    assert len(rows) == 2
    assert not rows[0]["drifted"], rows[0]
    assert rows[1]["drifted"], rows[1]
    assert rows[1]["l1_distance"] > rows[0]["l1_distance"]

    # replay guard: re-running the whole stream from a FRESH checkpoint
    # re-delivers both batches; committed ids must be skipped, not
    # double-appended (foreachBatch is at-least-once)
    q2 = drift_monitor_stream(
        spark, str(src), DOC_SCHEMA, ref, "lang", out, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert read_drift_log(spark, out).count() == 2

    # crash sim: a batch dir without _SUCCESS is invisible to the reader
    # and rewritten (not duplicated) when its id replays
    import os

    marker = os.path.join(out, "state=1", "_SUCCESS")
    os.remove(marker)
    assert read_drift_log(spark, out).count() == 1
    q3 = drift_monitor_stream(
        spark, str(src), DOC_SCHEMA, ref, "lang", out, str(tmp_path / "ckpt3")
    )
    q3.awaitTermination(120)
    recovered = {r["batch_id"]: r for r in read_drift_log(spark, out).collect()}
    assert len(recovered) == 2 and recovered[1]["drifted"]
