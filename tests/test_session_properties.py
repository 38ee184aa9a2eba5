"""Hypothesis property laws for this session's operator families (TPC-H
subquery shapes, statistical tests, time-series recurrences, retail/
behavioral analytics, sketches). Pure-Python reimplementations of each
operator's math contract checked against many generated inputs — the
driver oracle pins one corpus; these pin the algebra."""

import hashlib
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# CUSUM prefix identity (q_cusum_shift): the windowed form
# R_t − min(0, min_{i≤t} R_i) must equal the recursive max(0, ...) form on
# ANY integer residual series
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=100))
@settings(max_examples=300, deadline=None)
def test_cusum_prefix_identity(zs):
    s = 0
    rec = []
    for z in zs:
        s = max(0, s + z)
        rec.append(s)
    r = 0
    mn = 0
    win = []
    for z in zs:
        r += z
        mn = min(mn, r)
        win.append(r - min(0, mn))
    assert win == rec


# ---------------------------------------------------------------------------
# EWMA truncated power-of-two form (q_ewma_daily): the integer num/den
# ratio must equal the float definition and lie inside [min, max] of the
# window
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=300, deadline=None)
def test_ewma_bounds_and_exactness(ys, span):
    for t in range(len(ys)):
        lo = max(0, t - (span - 1))
        window = ys[lo : t + 1]
        num = sum(y * 2 ** (span - 1 - (t - (lo + i))) for i, y in enumerate(window))
        den = sum(2 ** (span - 1 - (t - (lo + i))) for i in range(len(window)))
        ewma = num / den
        assert min(window) <= ewma <= max(window)
        # most recent element carries the single largest weight
        if len(window) > 1:
            assert 2 ** (span - 1) > den - 2 ** (span - 1) or len(window) < span


# ---------------------------------------------------------------------------
# Mann-Whitney AUC from grouped counts (q_auc_rank): equals the pairwise
# definition with half-credit ties, and label-flip gives 1 − AUC
# ---------------------------------------------------------------------------


def _auc_grouped(scores, labels):
    groups = {}
    for s, y in zip(scores, labels):
        p, n = groups.get(s, (0, 0))
        groups[s] = (p + 1, n) if y else (p, n + 1)
    num2 = 0
    neg_below = 0
    for s in sorted(groups):
        p, n = groups[s]
        num2 += p * (2 * neg_below + n)
        neg_below += n
    P = sum(1 for y in labels if y)
    N = len(labels) - P
    return num2 / (2 * P * N)


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=2,
        max_size=120,
    )
)
@settings(max_examples=300, deadline=None)
def test_auc_equals_pairwise_and_flip(pairs):
    labels = [y for _, y in pairs]
    if not (any(labels) and not all(labels)):
        return
    scores = [s for s, _ in pairs]
    auc = _auc_grouped(scores, labels)
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    assert abs(auc - (wins + 0.5 * ties) / (len(pos) * len(neg))) < 1e-12
    flipped = _auc_grouped(scores, [not y for y in labels])
    assert abs(auc + flipped - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Interval merge (q_interval_merge): covered days bounded by
# [span, n·span]; merging is idempotent; islands never overlap
# ---------------------------------------------------------------------------


def _merge(starts, span):
    merged = []
    for s in sorted(starts):
        e = s + span
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return merged


@given(
    st.lists(st.integers(min_value=0, max_value=10000), min_size=1, max_size=80),
    st.integers(min_value=1, max_value=90),
)
@settings(max_examples=300, deadline=None)
def test_interval_merge_laws(starts, span):
    merged = _merge(starts, span)
    covered = sum(e - s for s, e in merged)
    assert span <= covered <= len(starts) * span
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        assert s2 > e1  # disjoint, strictly separated
    # idempotence: merging the merged island starts with their own widths
    # never splits them further
    assert len(_merge([s for s, _ in merged], span)) <= len(merged)


# ---------------------------------------------------------------------------
# Count-min sketch (q_countmin): estimate is never below the true count
# for ANY data and ANY (deterministic) hash family
# ---------------------------------------------------------------------------


def _cm_bucket(r, token, width):
    return int(hashlib.md5(f"{r}|{token}".encode()).hexdigest()[:15], 16) % width


@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=200),
    st.integers(min_value=2, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_countmin_never_underestimates(tokens, width):
    exact = Counter(tokens)
    cells = Counter()
    for tok, n in exact.items():
        for r in range(4):
            cells[(r, _cm_bucket(r, tok, width))] += n
    for tok, n in exact.items():
        est = min(cells[(r, _cm_bucket(r, tok, width))] for r in range(4))
        assert est >= n


# ---------------------------------------------------------------------------
# Winnowing (q_winnowing): any two sequences sharing a run of ≥ k+w−1
# tokens share at least one selected fingerprint (the SWA guarantee)
# ---------------------------------------------------------------------------


def _win_fps(tokens, k=3, w=4):
    if len(tokens) < k:
        return set()
    grams = [
        int(hashlib.md5(" ".join(tokens[i : i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(tokens) - k + 1)
    ]
    return {min(grams[i : i + w]) for i in range(max(len(grams) - w + 1, 1))}


@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=20),
    st.lists(st.sampled_from("ijklmnop"), min_size=0, max_size=10),
    st.lists(st.sampled_from("qrstuvwx"), min_size=0, max_size=10),
)
@settings(max_examples=200, deadline=None)
def test_winnowing_shared_run_guarantee(shared, pre, post):
    k, w = 3, 4
    if len(shared) < k + w - 1:
        return
    a = pre + shared
    b = shared + post
    fa = _win_fps(a, k, w)
    fb = _win_fps(b, k, w)
    assert fa & fb, "a shared run of >= k+w-1 tokens must share a fingerprint"


# ---------------------------------------------------------------------------
# ABC banding (q_abc_analysis): decimal-exact band tests partition the
# catalog; A-parts carry at most 80% + one part of the mass; classes are
# monotone in revenue rank
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=100))
@settings(max_examples=300, deadline=None)
def test_abc_banding_laws(revs):
    revs = sorted(revs, reverse=True)
    tot = sum(revs)
    cum = 0
    classes = []
    for r in revs:
        cum += r
        if cum * 5 <= tot * 4:
            classes.append("A")
        elif cum * 20 <= tot * 19:
            classes.append("B")
        else:
            classes.append("C")
    # monotone: once the class degrades it never upgrades
    order = {"A": 0, "B": 1, "C": 2}
    assert all(order[a] <= order[b] for a, b in zip(classes, classes[1:]))
    a_mass = sum(r for r, c in zip(revs, classes) if c == "A")
    assert a_mass * 5 <= tot * 4  # the A band never exceeds 80%
    assert classes[-1] == "C"  # the final cumulative step always exceeds 95%


# ---------------------------------------------------------------------------
# Relational division (q_relational_division): the count formulation
# equals the double-negation definition on any bipartite relation
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=4)),
        min_size=0,
        max_size=150,
    ),
    st.sets(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
)
@settings(max_examples=300, deadline=None)
def test_relational_division_equivalence(pairs, target)  :
    rel = set(pairs)
    # count formulation
    per = {}
    for c, b in rel:
        if b in target:
            per.setdefault(c, set()).add(b)
    by_count = {c for c, bs in per.items() if len(bs) == len(target)}
    # double-negation: no target element missing
    custs = {c for c, _ in rel}
    by_forall = {c for c in custs if all((c, b) in rel for b in target)}
    assert by_count == by_forall


# ---------------------------------------------------------------------------
# Block dedup ratio (q_doc_dup_ratio): disjoint blocks partition the
# token mass, so Σ per-doc dup tokens = Σ shared-block occurrences · W
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=3, max_size=35),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_block_dedup_duplicate_doc_law(docs):
    W = 3
    # clone the first document: every one of its blocks becomes shared
    docs = docs + [list(docs[0])]
    doc_blocks = []
    for toks in docs:
        doc_blocks.append([tuple(toks[b * W : (b + 1) * W]) for b in range(len(toks) // W)])
    owners = {}
    for i, blks in enumerate(doc_blocks):
        for b in blks:
            owners.setdefault(b, set()).add(i)
    shared = {b for b, o in owners.items() if len(o) >= 2}
    # the cloned pair: every block shared -> dup_ratio exactly 1
    for idx in (0, len(docs) - 1):
        blks = doc_blocks[idx]
        if blks:
            assert all(b in shared for b in blks)
    # bounds hold for every doc
    for blks in doc_blocks:
        ndup = sum(1 for b in blks if b in shared)
        assert 0 <= ndup <= len(blks)
