"""ST-DECON batch-equivalence: draining the streaming decontamination over a
closed directory must keep exactly the docs the batch plans keep — and the
two batch formulations (1-row array cross vs explode + semi-join) must agree
with each other."""

from pyspark.sql import Row

from cdmx_airquality_etl_spark.streaming.hygiene import (
    benchmark_gram_row,
    decontaminate_batch,
    decontaminate_stream,
    doc_grams,
)

SCHEMA = "doc_id long, text string"

# 6-word docs → exactly two 5-grams each; doc 11 shares its head 5-gram
# with benchmark doc 1, doc 12 shares nothing, doc 13 is shorter than n
# (zero grams → never contaminated), doc 14 duplicates benchmark text.
BENCH = [
    Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
    Row(doc_id=2, text="one two three four five six"),
]
DOCS = [
    Row(doc_id=11, text="alpha beta gamma delta epsilon QUUX"),
    Row(doc_id=12, text="totally fresh words never seen anywhere"),
    Row(doc_id=13, text="too short"),
    Row(doc_id=14, text="one two three four five six"),
]
CLEAN_IDS = {12, 13}


def test_batch_formulations_agree(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    via_array = {r.doc_id for r in decontaminate_stream(docs, bench).collect()}
    bench_grams = bench.select(
        doc_grams("text").alias("g")
    ).selectExpr("explode(g) AS gram").distinct()
    via_semi = {
        r.doc_id for r in decontaminate_batch(docs, bench_grams).collect()
    }
    assert via_array == via_semi == CLEAN_IDS


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(DOCS, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    docs.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    clean = decontaminate_stream(stream, bench)
    assert clean.isStreaming
    (
        clean.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == CLEAN_IDS


def test_benchmark_gram_row_is_single_sorted_row(spark):
    bench = spark.createDataFrame(BENCH, SCHEMA)
    rows = benchmark_gram_row(bench).collect()
    assert len(rows) == 1
    grams = rows[0]["bench_grams"]
    assert grams == sorted(grams)
    assert len(grams) == len(set(grams)) == 4  # 2 docs × 2 grams, distinct
