"""Property-based merge laws (hypothesis): for ANY generated target/source
frames on the same key space, merge_upsert must satisfy

1. key closure      — output keys = target keys ∪ source keys, exactly once
2. source-wins      — every key present in source carries source values
3. target-preserved — keys absent from source carry target values verbatim
4. counter law      — matched keys bump by exactly 1, inserts start at 1
5. re-merge growth  — merging the same source twice bumps matched counters
                      by exactly 2 total (idempotent data, linear counter)

Example-based tests (test_merge.py) pin the reference's golden scenarios;
these pin the algebra for arbitrary inputs, which is what holds under task
retries and reordering at scale.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from cdmx_airquality_etl_spark.plans.merge import merge_upsert

# keep frames tiny: each hypothesis example spins Spark jobs
_keys = st.integers(min_value=0, max_value=6)
_vals = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
_frame = st.dictionaries(_keys, _vals, min_size=0, max_size=5)


def _df(spark, d, with_counter=False):
    rows = [
        Row(k=k, v=v, nupdates=1) if with_counter else Row(k=k, v=v)
        for k, v in sorted(d.items())
    ]
    schema = "k long, v long" + (", nupdates long" if with_counter else "")
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


@given(target=_frame, source=_frame)
@settings(max_examples=12, deadline=None)
def test_merge_laws(spark, target, source):
    tgt = _df(spark, target, with_counter=True)
    src = _df(spark, source)

    out = {
        r["k"]: (r["v"], r["nupdates"])
        for r in merge_upsert(tgt, src, ["k"], counter_col="nupdates").collect()
    }

    # 1. key closure, exactly-once
    assert set(out) == set(target) | set(source)
    for k, (v, n) in out.items():
        if k in source:
            assert v == source[k]  # 2. source wins (even NULL)
            assert n == (2 if k in target else 1)  # 4. counter law
        else:
            assert v == target[k]  # 3. target preserved
            assert n == 1

    # 5. linear counter, idempotent data on re-merge
    merged_once = merge_upsert(tgt, src, ["k"], counter_col="nupdates")
    twice = {
        r["k"]: (r["v"], r["nupdates"])
        for r in merge_upsert(merged_once, src, ["k"], counter_col="nupdates").collect()
    }
    for k, (v, n) in twice.items():
        assert v == out[k][0]
        expected = out[k][1] + (1 if k in source else 0)
        assert n == expected
