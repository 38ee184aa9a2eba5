"""ST-HW tests: the incrementally-maintained day-count series must equal
the one-shot batch aggregate under any split and under replay, and the
forecast read from maintained state must equal q_holt_winters BITWISE once
the stream drains (same hw_from_daily fold, same exact-integer series)."""

from cdmx_airquality_etl_spark.operators.timeseries import _daily
from cdmx_airquality_etl_spark.registry import QUERIES
from cdmx_airquality_etl_spark.sources.parquet import load_table
from cdmx_airquality_etl_spark.streaming.forecast_monitor import (
    batch_daily,
    forecast_stream,
    merge_daily,
    read_daily_state,
    read_forecast,
    update_daily_state,
)


def test_daily_merge_is_split_invariant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    whole = {r["d"]: r["y"] for r in batch_daily(ev).collect()}
    lo = ev.filter(ev.event_id % 2 == 0)
    hi = ev.filter(ev.event_id % 2 == 1)
    merged = {
        r["d"]: r["y"]
        for r in merge_daily(batch_daily(lo), batch_daily(hi)).collect()
    }
    assert merged == whole


def test_update_state_is_replay_safe(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "st")
    update_daily_state(spark, ev, state, 0)
    once = {r["d"]: r["y"] for r in read_daily_state(spark, state).collect()}
    update_daily_state(spark, ev, state, 0)  # replay of the same batch id
    again = {r["d"]: r["y"] for r in read_daily_state(spark, state).collect()}
    assert once == again
    assert once == {r["d"]: r["y"] for r in _daily(spark, sf_dir).collect()}


def test_stream_forecast_matches_batch_bitwise(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    q = forecast_stream(spark, src, ev.schema, state, str(tmp_path / "ck"))
    q.awaitTermination()
    got = sorted(
        (tuple(r) for r in read_forecast(spark, state).collect())
    )
    want = sorted(
        (tuple(r) for r in QUERIES["q_holt_winters"](spark, sf_dir).collect())
    )
    assert got == want  # bitwise: same fold over the same exact series


def test_empty_state_forecast_is_empty(spark, tmp_path):
    assert read_daily_state(spark, str(tmp_path / "none")).count() == 0
    assert read_forecast(spark, str(tmp_path / "none")).count() == 0
