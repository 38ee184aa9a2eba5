"""Exactness of the adjacency-anchor Jaccard join (dedup._anchor_jaccard_pairs,
the round-9 restructure of the fuzzy-dedup core).

The coverage proof lives on the function; these tests attack it:

- brute-force equivalence on randomized corpora (hypothesis), where the
  reference answer enumerates ALL pairs — any anchor-coverage hole shows
  up as a missing pair;
- the adversarial shapes the proof's inequalities are tight on: S = 2 with
  all extras piled in one gap, exact-threshold pairs (J = t exactly),
  subset pairs, singleton/tiny docs (the S = 1 branch), identical docs;
- parameter algebra of anchor_params.
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.operators.dedup import (
    _JACCARD_THRESHOLD,
    _anchor_jaccard_pairs,
    anchor_params,
)


def _brute(sets: dict[int, frozenset], t: float):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = inter / union
    return out


def _spark_pairs(spark, sets: dict[int, frozenset], t: float):
    rows = [(i, sorted(s)) for i, s in sets.items()]
    shingled = spark.createDataFrame(
        rows, "doc_id long, sh array<string>"
    ).withColumn("n_sh", F.size("sh"))
    got = _anchor_jaccard_pairs(shingled, t).collect()
    return {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in got}


def test_anchor_params_algebra():
    assert anchor_params(0.5) == (3, 2)
    assert anchor_params(0.8) == (1, 1)
    assert anchor_params(0.1) == (19, 10)
    # epsilon may only round UP (more anchors = safe)
    k, cutoff = anchor_params(1.0 / 3.0)
    assert k >= 5 and cutoff >= 3


def test_adversarial_gap_and_threshold_shapes(spark):
    t = _JACCARD_THRESHOLD  # 0.5
    sets = {
        # S=2, both extras inside the single intersection gap of doc 0:
        # J = 2/4 = 0.5 exactly — the k=2 scheme provably misses this one
        0: frozenset("b e f s".split()),   # sorted: b < e < f < s
        1: frozenset("b s".split()),       # shares {b, s}; gap holds e, f
        # subset pair: J = 3/6 = 0.5 exactly
        2: frozenset("a c d g h j".split()),
        3: frozenset("c d g".split()),     # wait: shares {c,d,g} J=3/6
        # identical docs
        4: frozenset("x y z".split()),
        5: frozenset("x y z".split()),
        # singleton docs (S=1 branch): J = 1/2 >= 0.5
        6: frozenset(["q"]),
        7: frozenset("q r".split()),
        8: frozenset(["q"]),
        # non-qualifying noise
        9: frozenset("m n o p".split()),
    }
    expect = _brute(sets, t)
    got = _spark_pairs(spark, sets, t)
    assert got == pytest.approx(expect)
    # the shapes this test exists for really are in the expected set
    assert (0, 1) in expect and expect[(0, 1)] == 0.5
    assert (4, 5) in expect and expect[(4, 5)] == 1.0
    assert (6, 8) in expect and (6, 7) in expect


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.frozensets(st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=8),
        min_size=2,
        max_size=14,
    ),
    t=st.sampled_from([0.3, 0.5, 0.6, 0.8]),
)
def test_matches_brute_force_on_random_corpora(spark, data, t):
    """Dense tiny vocab (12 types) against docs of 1-8 shingles: maximal
    collision pressure on the anchor scheme, every threshold regime."""
    sets = dict(enumerate(data))
    assert _spark_pairs(spark, sets, t) == pytest.approx(_brute(sets, t))


def test_hot_anchor_guard_bounds_candidates_without_changing_output(spark):
    """The band-skew probe's pinned guard (round-9 VERDICT #3): a
    boilerplate cluster — many docs sharing one shingle run, pairwise
    Jaccard BELOW threshold — makes its anchors hot. With
    max_anchor_postings set, those anchors drop before the self-join, so
    no key can fan out past cap²/2; the output must be IDENTICAL to the
    exact uncapped run because every qualifying pair still has a
    sub-cap anchor (here: the boiler pairs never qualified at all)."""
    from pyspark.sql import functions as F

    boiler = " ".join(f"mm{i:02d}" for i in range(10))
    rows = []
    # 40-doc boilerplate cluster with unique tails (J ~ 8/(8+2*16) < 0.5)
    for i in range(40):
        tail = " ".join(f"t{i:02d}x{j:02d}" for j in range(18))
        rows.append((i, f"{boiler} {tail}"))
    # one true near-dup pair outside the cluster
    rows.append((100, "aa bb cc dd ee ff gg hh"))
    rows.append((101, "aa bb cc dd ee ff gg zz"))
    from cdmx_airquality_etl_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _anchor_jaccard_pairs,
    )

    shingled = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(size(split(lower(text), ' ')) - 2, 1)),"
                    " i -> concat_ws(' ', slice(split(lower(text), ' '), i, 3)))"
                )
            ).alias("sh"),
        )
        .withColumn("n_sh", F.size("sh"))
    )
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in _anchor_jaccard_pairs(shingled, _JACCARD_THRESHOLD).collect()
    }
    capped = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in _anchor_jaccard_pairs(
            shingled, _JACCARD_THRESHOLD, max_anchor_postings=10
        ).collect()
    }
    assert (100, 101) in exact
    assert capped == exact  # guard engaged, output unchanged
    # and the guard really engaged: boiler anchors exceed the cap
    from cdmx_airquality_etl_spark.operators.dedup import anchor_params

    k, cutoff = anchor_params(_JACCARD_THRESHOLD)
    anch = (
        shingled.withColumn("__shs", F.array_sort("sh"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"""flatten(transform(sequence(1, size(__shs)), i ->
                      filter(transform(sequence(i + 1, i + {k}), j ->
                        if(j <= size(__shs), struct(__shs[i-1] AS lo, __shs[j-1] AS hi),
                           cast(null AS struct<lo:string,hi:string>))),
                        p -> p IS NOT NULL)))"""
                )
            ).alias("a"),
        )
        .groupBy("a.lo", "a.hi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert anch.filter(F.col("c") > 10).count() > 0
