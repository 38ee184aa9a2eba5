"""ST-AB tests: the incrementally-maintained cohort moments must equal the
one-shot batch computation under any split (moment addition is
associative/commutative), the final trajectory z must equal q_ab_welch's
statistic bitwise, replay must not double-count (the versioned-commit
contract), and the stream wiring must converge to the same state."""

from cdmx_airquality_etl_spark.registry import QUERIES
from cdmx_airquality_etl_spark.sources.parquet import load_table
from cdmx_airquality_etl_spark.streaming.ab_monitor import (
    ab_monitor_stream,
    batch_moments,
    merge_moments,
    read_ab_trajectory,
    read_state,
    update_state,
)

_MOMENTS = ("na", "nb", "sa", "sb", "qa", "qb")


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )


def test_moment_merge_is_split_invariant(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    whole = batch_moments(orders).collect()[0]
    # split by custkey parity of a different modulus
    lo = orders.filter(orders.o_custkey % 3 != 0)
    hi = orders.filter(orders.o_custkey % 3 == 0)
    merged = merge_moments(batch_moments(lo), batch_moments(hi)).collect()[0]
    for c in _MOMENTS:
        assert merged[c] == whole[c]


def test_update_state_is_replay_safe(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    state = str(tmp_path / "st")
    update_state(spark, orders, state, 0, "o_custkey", "o_totalprice")
    once = read_state(spark, state).collect()[0]
    # replaying the SAME batch id must not double-count
    update_state(spark, orders, state, 0, "o_custkey", "o_totalprice")
    again = read_state(spark, state).collect()[0]
    for c in _MOMENTS:
        assert once[c] == again[c]
    whole = batch_moments(orders).collect()[0]
    for c in _MOMENTS:
        assert once[c] == whole[c]


def test_stream_converges_to_batch_and_final_z_is_welch(
    spark, sf_dir, tmp_path
):
    orders = _orders(spark, sf_dir)
    src = str(tmp_path / "src")
    orders.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    q = ab_monitor_stream(
        spark,
        src,
        orders.schema,
        state,
        str(tmp_path / "ck"),
    )
    q.awaitTermination()
    final = read_state(spark, state).collect()[0]
    whole = batch_moments(orders).collect()[0]
    for c in _MOMENTS:
        assert final[c] == whole[c]
    n_total = final["na"] + final["nb"]
    traj = sorted(
        read_ab_trajectory(spark, state, n_total).collect(),
        key=lambda r: r["version"],
    )
    assert traj
    # information grows monotonically to exactly 1.0
    for a, b in zip(traj, traj[1:]):
        assert a["info_frac"] <= b["info_frac"]
        assert a["na"] + a["nb"] <= b["na"] + b["nb"]
    assert traj[-1]["info_frac"] == 1.0
    for r in traj:
        assert r["z_boundary"] >= 2.5
        assert r["crossed"] == (
            1 if abs(r["z_welch"]) >= r["z_boundary"] else 0
        )
    # the final trajectory point IS the batch Welch statistic (bitwise)
    welch = QUERIES["q_ab_welch"](spark, sf_dir).collect()[0]
    assert traj[-1]["z_welch"] == welch["t_welch"]
    assert traj[-1]["na"] == welch["n_a"] and traj[-1]["nb"] == welch["n_b"]


def test_empty_state_bootstrap(spark, tmp_path):
    empty = read_state(spark, str(tmp_path / "nothing"))
    row = empty.collect()[0]
    assert all(row[c] == 0 for c in _MOMENTS)
    traj = read_ab_trajectory(spark, str(tmp_path / "nothing"), 100)
    assert traj.count() == 0
