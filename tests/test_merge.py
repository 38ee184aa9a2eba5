"""Merge-semantics tests per SURVEY.md §5.3 / FIXTURES.md §1.6: re-ingesting
the same snapshot leaves values equal but nupdates+1; new keys insert with
nupdates=1; changed values overwrite; NULLs store as NULL
(/root/reference/scrapper.py:197-212 semantics)."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.plans.merge import (
    collapse_to_key_grain,
    merge_into_parquet,
    merge_upsert,
)


def _snapshot(spark, rows):
    return spark.createDataFrame(
        [Row(report_ts=r[0], clave_str=r[1], calidad=r[2]) for r in rows],
        "report_ts long, clave_str string, calidad string",
    )


KEYS = ["report_ts", "clave_str"]


def test_merge_insert_then_rescrape_bumps_counter(spark):
    base = _snapshot(spark, [(2025052314, "UIZ", "buena"), (2025052314, "MER", "mala")])
    t1 = merge_upsert(base.limit(0), base, KEYS, counter_col="nupdates")
    assert {r["nupdates"] for r in t1.collect()} == {1}

    # same snapshot again → values equal, counter bumped exactly once
    t2 = merge_upsert(t1, base, KEYS, counter_col="nupdates")
    rows = {(r["report_ts"], r["clave_str"]): r for r in t2.collect()}
    assert len(rows) == 2
    assert all(r["nupdates"] == 2 for r in rows.values())
    assert rows[(2025052314, "UIZ")]["calidad"] == "buena"


def test_merge_overwrite_insert_and_null(spark):
    target = merge_upsert(
        _snapshot(spark, []).limit(0),
        _snapshot(spark, [(1, "UIZ", "buena"), (1, "MER", "mala")]),
        KEYS,
        counter_col="nupdates",
    )
    source = _snapshot(
        spark,
        [(1, "UIZ", "aceptable"),  # changed value → overwrite
         (1, "PED", "buena"),      # new key → insert
         (1, "MER", None)],        # NULL → stored as NULL (scrapper.py:212)
    )
    merged = merge_upsert(target, source, KEYS, counter_col="nupdates")
    rows = {(r["report_ts"], r["clave_str"]): r for r in merged.collect()}
    assert rows[(1, "UIZ")]["calidad"] == "aceptable"
    assert rows[(1, "UIZ")]["nupdates"] == 2
    assert rows[(1, "PED")]["calidad"] == "buena"
    assert rows[(1, "PED")]["nupdates"] == 1
    assert rows[(1, "MER")]["calidad"] is None
    assert rows[(1, "MER")]["nupdates"] == 2


def test_merge_idempotent_under_duplicated_batch(spark):
    """A duplicated row in the batch (task retry shape) must not double-bump —
    SURVEY.md §7 counter-idempotency."""
    target = merge_upsert(
        _snapshot(spark, []).limit(0),
        _snapshot(spark, [(1, "UIZ", "buena")]),
        KEYS,
        counter_col="nupdates",
    )
    dup_batch = _snapshot(spark, [(1, "UIZ", "mala"), (1, "UIZ", "mala")])
    merged = merge_upsert(target, dup_batch, KEYS, counter_col="nupdates",
                          dedup_source=True)
    rows = merged.collect()
    assert len(rows) == 1
    assert rows[0]["nupdates"] == 2


def test_collapse_to_key_grain(spark):
    df = _snapshot(spark, [(1, "UIZ", "a"), (1, "UIZ", "b"), (2, "UIZ", "c")])
    out = collapse_to_key_grain(df, KEYS)
    assert out.count() == 2


def test_merge_into_parquet_roundtrip(spark, tmp_path):
    path = os.path.join(str(tmp_path), "cdmx")
    b1 = _snapshot(spark, [(2025052314, "UIZ", "buena")])
    merge_into_parquet(spark, b1, path, KEYS, counter_col="nupdates")
    b2 = _snapshot(spark, [(2025052314, "UIZ", "mala"), (2025052315, "UIZ", "buena")])
    merge_into_parquet(spark, b2, path, KEYS, counter_col="nupdates")

    out = {(r["report_ts"], r["clave_str"]): r
           for r in spark.read.parquet(path).collect()}
    assert out[(2025052314, "UIZ")]["calidad"] == "mala"
    assert out[(2025052314, "UIZ")]["nupdates"] == 2
    assert out[(2025052315, "UIZ")]["nupdates"] == 1


def test_merge_into_parquet_partition_scoped(spark, tmp_path):
    """Partitioned merge rewrites only touched partitions."""
    path = os.path.join(str(tmp_path), "part_tbl")
    b1 = _snapshot(spark, [(2024010100, "UIZ", "buena"), (2025010100, "MER", "mala")])
    b1 = b1.withColumn("year_num", (F.col("report_ts") / 1000000).cast("int"))
    merge_into_parquet(spark, b1, path, KEYS, counter_col="nupdates",
                       partition_col="year_num")
    # batch touching only 2025
    b2 = _snapshot(spark, [(2025010100, "MER", "regular")])
    b2 = b2.withColumn("year_num", (F.col("report_ts") / 1000000).cast("int"))
    merge_into_parquet(spark, b2, path, KEYS, counter_col="nupdates",
                       partition_col="year_num")
    out = {(r["report_ts"], r["clave_str"]): r
           for r in spark.read.parquet(path).collect()}
    assert out[(2024010100, "UIZ")]["nupdates"] == 1  # untouched partition intact
    assert out[(2025010100, "MER")]["calidad"] == "regular"
    assert out[(2025010100, "MER")]["nupdates"] == 2


def test_merge_partition_alignment_probe(spark, tmp_path):
    """A key reappearing under a different partition value violates the
    functional-dependency contract: the opt-in probe must fail loudly
    (silently it would duplicate the key with a reset counter)."""
    import pytest

    path = os.path.join(str(tmp_path), "mis_tbl")
    b1 = _snapshot(spark, [(2024010100, "UIZ", "buena")])
    b1 = b1.withColumn("year_num", F.lit(2024))
    merge_into_parquet(spark, b1, path, KEYS, counter_col="nupdates",
                       partition_col="year_num")
    # same merge key, different partition value
    b2 = _snapshot(spark, [(2024010100, "UIZ", "mala")])
    b2 = b2.withColumn("year_num", F.lit(2025))
    with pytest.raises(ValueError, match="functionally dependent"):
        merge_into_parquet(spark, b2, path, KEYS, counter_col="nupdates",
                           partition_col="year_num",
                           check_partition_alignment=True)
    # aligned batch passes the probe
    b3 = _snapshot(spark, [(2024010100, "UIZ", "regular")])
    b3 = b3.withColumn("year_num", F.lit(2024))
    merge_into_parquet(spark, b3, path, KEYS, counter_col="nupdates",
                       partition_col="year_num",
                       check_partition_alignment=True)
    out = {r["clave_str"]: r for r in spark.read.parquet(path).collect()}
    assert out["UIZ"]["calidad"] == "regular" and out["UIZ"]["nupdates"] == 2
