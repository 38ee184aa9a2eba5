"""Incremental JOIN-view maintenance (plans/ivm_join.py): every delta
application must leave the materialized view EXACTLY equal to a full
recompute of the view definition over the current base tables."""

import pytest
from pyspark.sql import Row

from cdmx_airquality_etl_spark.plans.ivm_join import (
    apply_dim_delta,
    apply_fact_delta,
    build_view,
)

FACT = "k int, fid int, qty int"
DIM = "k int, name string"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def base(spark, tmp_path):
    a0 = spark.createDataFrame(
        [Row(k=1, fid=10, qty=5), Row(k=2, fid=11, qty=7), Row(k=1, fid=12, qty=2)],
        FACT,
    )
    b0 = spark.createDataFrame(
        [Row(k=1, name="one"), Row(k=2, name="two"), Row(k=3, name="three")], DIM
    )
    view_path = str(tmp_path / "view")
    build_view(a0, b0, "k").write.parquet(view_path)
    return a0, b0, view_path


def test_fact_append_matches_full_recompute(spark, base):
    a0, b0, view_path = base
    delta = spark.createDataFrame(
        [Row(k=2, fid=13, qty=9), Row(k=3, fid=14, qty=1)], FACT
    )
    apply_fact_delta(spark, view_path, delta, b0, "k")
    a1 = a0.unionByName(delta)
    assert _rows(spark.read.parquet(view_path)) == _rows(build_view(a1, b0, "k"))


def test_fact_append_cost_is_delta_sized(spark, base):
    # the delta path must not rescan A: it joins ONLY the delta frame
    a0, b0, view_path = base
    delta = spark.createDataFrame([Row(k=1, fid=15, qty=3)], FACT)
    before = spark.read.parquet(view_path).count()
    apply_fact_delta(spark, view_path, delta, b0, "k")
    assert spark.read.parquet(view_path).count() == before + 1


def test_dim_update_rewrites_only_affected_keys(spark, base):
    a0, b0, view_path = base
    # key 1 renamed; keys 2,3 untouched
    b_new_rows = spark.createDataFrame([Row(k=1, name="ONE")], DIM)
    apply_dim_delta(spark, view_path, a0, b_new_rows, "k")
    b1 = spark.createDataFrame(
        [Row(k=1, name="ONE"), Row(k=2, name="two"), Row(k=3, name="three")], DIM
    )
    assert _rows(spark.read.parquet(view_path)) == _rows(build_view(a0, b1, "k"))
    # untouched key rows kept their values
    got = {
        (r["fid"]): r["name"] for r in spark.read.parquet(view_path).collect()
    }
    assert got[11] == "two" and got[10] == "ONE"


def test_dim_update_then_fact_append_compose(spark, base):
    a0, b0, view_path = base
    b_new_rows = spark.createDataFrame([Row(k=2, name="TWO")], DIM)
    apply_dim_delta(spark, view_path, a0, b_new_rows, "k")
    delta = spark.createDataFrame([Row(k=2, fid=16, qty=4)], FACT)
    b1 = spark.createDataFrame(
        [Row(k=1, name="one"), Row(k=2, name="TWO"), Row(k=3, name="three")], DIM
    )
    apply_fact_delta(spark, view_path, delta, b1, "k")
    a1 = a0.unionByName(delta)
    assert _rows(spark.read.parquet(view_path)) == _rows(build_view(a1, b1, "k"))


def test_streaming_view_maintenance(spark, tmp_path):
    """The streamed fact path must equal full recompute after the stream
    drains the landing directory (batch-equivalence, the ST-* contract)."""
    import os

    from pyspark.sql.types import IntegerType, StructField, StructType

    from cdmx_airquality_etl_spark.streaming.view_maintenance import (
        read_view,
        seed_view,
        view_maintenance_stream,
    )

    fact_schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("fid", IntegerType(), True),
            StructField("qty", IntegerType(), True),
        ]
    )
    dim = spark.createDataFrame(
        [Row(k=1, name="one"), Row(k=2, name="two")], DIM
    )
    fact_dir = str(tmp_path / "facts")
    view_path = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(fact_dir)
    # seed view from the first file, then land two more
    batches = [
        [Row(k=1, fid=1, qty=10)],
        [Row(k=2, fid=2, qty=20), Row(k=1, fid=3, qty=30)],
        [Row(k=2, fid=4, qty=40)],
    ]
    spark.createDataFrame(batches[0], fact_schema).write.parquet(
        os.path.join(fact_dir, "b0")
    )
    seed_view(
        build_view(spark.read.parquet(os.path.join(fact_dir, "b0")), dim, "k"),
        view_path,
    )
    # the stream starts AFTER the seed: point it at a fresh landing dir
    # (part files appended directly — the file source does not recurse)
    land = str(tmp_path / "landing")
    os.makedirs(land)
    for rows in batches[1:]:
        spark.createDataFrame(rows, fact_schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)
    q = view_maintenance_stream(
        spark, land, fact_schema, dim, "k", view_path, ckpt
    )
    q.awaitTermination()
    all_facts = spark.createDataFrame(
        [r for b in batches for r in b], fact_schema
    )
    assert _rows(read_view(spark, view_path)) == _rows(
        build_view(all_facts, dim, "k")
    )
    # a second run over the same landing dir is a no-op (checkpoint)
    n = read_view(spark, view_path).count()
    q2 = view_maintenance_stream(
        spark, land, fact_schema, dim, "k", view_path, ckpt
    )
    q2.awaitTermination()
    assert read_view(spark, view_path).count() == n

    # at-least-once replay: a FRESH checkpoint re-delivers every landed
    # file; committed batch ids must be skipped, not double-appended
    q3 = view_maintenance_stream(
        spark, land, fact_schema, dim, "k", view_path, str(tmp_path / "ckpt2")
    )
    q3.awaitTermination()
    assert read_view(spark, view_path).count() == n


def test_versioned_fact_delta_replay_and_crash(spark, tmp_path):
    """The commit guard itself: a committed batch id short-circuits; a
    crashed (markerless) batch is invisible to read_view and is
    rewritten in place on retry."""
    import os

    from cdmx_airquality_etl_spark.streaming.view_maintenance import (
        apply_fact_delta_versioned,
        read_view,
        seed_view,
    )

    dim = spark.createDataFrame([Row(k=1, name="one"), Row(k=2, name="two")], DIM)
    seed = spark.createDataFrame([Row(k=1, fid=1, qty=10)], FACT)
    view_path = str(tmp_path / "view")
    seed_view(build_view(seed, dim, "k"), view_path)
    delta = spark.createDataFrame([Row(k=2, fid=2, qty=20)], FACT)

    assert apply_fact_delta_versioned(spark, view_path, delta, dim, "k", 0) is True
    assert read_view(spark, view_path).count() == 2
    # replay of a committed id: skipped, no double-append
    assert apply_fact_delta_versioned(spark, view_path, delta, dim, "k", 0) is False
    assert read_view(spark, view_path).count() == 2
    # crash sim: strip the marker — the batch disappears from reads and
    # the retry rewrites it exactly once
    os.remove(os.path.join(view_path, "batch=0", "_SUCCESS"))
    assert read_view(spark, view_path).count() == 1
    assert apply_fact_delta_versioned(spark, view_path, delta, dim, "k", 0) is True
    assert read_view(spark, view_path).count() == 2
