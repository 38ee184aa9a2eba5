"""Property-based tests (hypothesis) for the scalar function library — the
laws that golden pairs can't exhaustively pin:

- normalize_text is idempotent and its output alphabet is closed
  (lowercase ASCII, digits, underscores and leftover symbols — never spaces,
  never accents), for ANY unicode input, matching the reference semantics
  (/root/reference/scrapper.py:20-26: NFKD → drop non-ASCII → lower →
  spaces→underscores).
- pack_report_ts/unpack_report_ts roundtrip for any timestamp in the
  engine's operating range (the yyyyMMddHH packing at scrapper.py:51).

These run the driver-side Python twins (normalize_text_py / plain
arithmetic), which the Spark-side tests (test_functions.py) pin as equal to
the column expressions — so the laws proved here transfer.
"""

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from cdmx_airquality_etl_spark.functions import normalize_text_py


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text_py(s)
    assert normalize_text_py(once) == once


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_normalize_output_alphabet(s):
    out = normalize_text_py(s)
    assert out is not None
    assert " " not in out
    assert out == out.lower()
    assert all(ord(c) < 128 for c in out)  # accent fold never leaks non-ASCII


@given(
    st.datetimes(
        min_value=datetime(1970, 1, 1), max_value=datetime(2099, 12, 31, 23)
    )
)
@settings(max_examples=500, deadline=None)
def test_report_ts_pack_roundtrip(dt):
    packed = ((dt.year * 100 + dt.month) * 100 + dt.day) * 100 + dt.hour
    # unpack (the inverse the SQL expressions implement)
    hour = packed % 100
    day = (packed // 100) % 100
    month = (packed // 10000) % 100
    year = packed // 1000000
    assert (year, month, day, hour) == (dt.year, dt.month, dt.day, dt.hour)
    # packing is strictly monotone in time → usable as an ordered key
    assert 1970010100 <= packed <= 2099123123


# ---------------------------------------------------------------------------
# q_gopher_rules' sorted-run top-count fold: for ANY token multiset, the
# longest equal run of the sorted array equals the max occurrence count —
# the law the 3×-faster formulation rests on (operators/corpus_quality.py).
# Checked via one Spark expression evaluation over a literal array per case.
# ---------------------------------------------------------------------------
def _spark_top_count(spark, tokens):
    from pyspark.sql import functions as F

    from cdmx_airquality_etl_spark.operators.corpus_quality import _top_count

    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    return df.select(_top_count(F.col("toks")).alias("x")).collect()[0]["x"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_top_count_equals_max_occurrence(spark, tokens):
    want = max(tokens.count(t) for t in set(tokens))
    assert _spark_top_count(spark, tokens) == want
