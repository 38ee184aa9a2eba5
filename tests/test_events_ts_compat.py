"""The driver's testdata generator has shipped events.ts as TIMESTAMP(NANOS)
(rounds 1-2) and TIMESTAMP(MICROS) (round 3). load_table must read BOTH
encodings to the same TimestampType column — ns files via the
nanosAsLong + floor-to-µs path, µs files natively — or every events query
silently shifts by 1000×. Pin it with synthesized files of each encoding."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.sources.parquet import load_table

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 6, 15, 12, 30, 0, 1),
    datetime.datetime(2025, 12, 31, 23, 59, 59, 999999),
]


def _write_events(dirpath, unit):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "error"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet")
    return str(dirpath)


def test_micros_and_nanos_files_load_identically(spark, tmp_path):
    us_dir = tmp_path / "us"
    ns_dir = tmp_path / "ns"
    us_dir.mkdir()
    ns_dir.mkdir()
    _write_events(us_dir, "us")
    _write_events(ns_dir, "ns")

    us_rows = sorted(
        (r.event_id, r.ts) for r in load_table(spark, str(us_dir), "events").collect()
    )
    ns_rows = sorted(
        (r.event_id, r.ts) for r in load_table(spark, str(ns_dir), "events").collect()
    )
    assert us_rows == ns_rows
    assert [ts for _, ts in us_rows] == _TS


def test_loaded_schema_is_timestamp_both_ways(spark, tmp_path):
    for unit in ("us", "ns"):
        d = tmp_path / f"schema_{unit}"
        d.mkdir()
        _write_events(d, unit)
        df = load_table(spark, str(d), "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
