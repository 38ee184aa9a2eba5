"""Exactness of q_dedup_weighted's mass-distance anchors (round-9
restructure). The count-based adjacency anchors of _anchor_jaccard_pairs
cannot cover weighted Jaccard — extras may be MANY near-zero-weight
shingles — so the weighted op budgets anchor reach by BETWEEN-MASS
(proof on the operator). These tests attack that proof with brute force:

- the boilerplate-straddle shape the mass budget exists for: two docs
  sharing heavy content separated (in global shingle order) by a run of
  corpus-universal zero-weight shingles that a count-distance anchor
  (k = 3) provably cannot bridge;
- randomized corpora with a universal boilerplate suffix (hypothesis).
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdmx_airquality_etl_spark.operators.dedup import (
    _WEIGHTED_THRESHOLD,
    QUERIES,
)


def _shingles(text: str) -> frozenset:
    w = text.strip().lower().split()
    if len(w) < 3:
        return frozenset([" ".join(w)]) if w else frozenset()
    return frozenset(" ".join(w[i : i + 3]) for i in range(len(w) - 2))


def _brute_weighted(texts: dict[int, str], t: float):
    sets = {i: _shingles(x) for i, x in texts.items()}
    n = len(texts)
    df: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    w = {sh: n - d for sh, d in df.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = sets[a] & sets[b]
        if not inter:
            continue
        ws = sum(w[s] for s in inter)
        wa = sum(w[s] for s in sets[a])
        wb = sum(w[s] for s in sets[b])
        denom = wa + wb - ws
        if denom > 0 and ws / denom >= t:
            out[(a, b)] = ws / denom
    return out


def _run(spark, tmp_path, texts: dict[int, str]):
    rows = [(i, x, "en", "src0", len(x)) for i, x in texts.items()]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = QUERIES["q_dedup_weighted"](spark, str(tmp_path)).collect()
    return {
        (r["doc_id_a"], r["doc_id_b"]): r["weighted_jaccard"] for r in got
    }


def test_boilerplate_straddle_bridged_by_mass_anchor(spark, tmp_path):
    """Docs 0/1 share heavy 'aa*' and 'zz*' shingles separated in sorted
    order by a long run of zero-weight boilerplate ('mm*' words appear in
    EVERY doc, so w = 0). Count-distance anchors at k=3 cannot connect
    aa-to-zz across the run; the mass budget crosses it for free. The two
    docs differ in their heavy middle words so the pair is a true
    near-dup, not an identical pair."""
    boiler = " ".join(f"mm{i:02d}" for i in range(12))
    texts = {
        0: f"aa1 aa2 aa3 aa4 {boiler} zz1 zz2 zz3 zz4",
        1: f"aa1 aa2 aa3 aa4 {boiler} zz1 zz2 zz3 zz9",
        # more docs carrying ONLY the boilerplate => its shingles are
        # corpus-universal, w == 0
        2: f"qq1 qq2 qq3 {boiler} rr1 rr2 rr3",
        3: f"uu1 uu2 uu3 {boiler} vv1 vv2 vv3",
    }
    expect = _brute_weighted(texts, _WEIGHTED_THRESHOLD)
    assert (0, 1) in expect  # the shape under test really qualifies
    got = _run(spark, tmp_path, texts)
    assert got == pytest.approx(expect)


@settings(
    max_examples=12,
    deadline=None,
    # tmp_path reuse across examples is intentional: each example
    # overwrites documents.parquet in place (mode=overwrite)
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(8)]), min_size=3, max_size=10
        ),
        min_size=2,
        max_size=8,
    ),
    with_boiler=st.booleans(),
)
def test_weighted_matches_brute_force(spark, tmp_path, docs, with_boiler):
    boiler = " k1 k2 k3 k4 k5" if with_boiler else ""
    texts = {i: " ".join(ws) + boiler for i, ws in enumerate(docs)}
    assert _run(spark, tmp_path, texts) == pytest.approx(
        _brute_weighted(texts, _WEIGHTED_THRESHOLD)
    )
