"""Hypothesis property laws for the round-4 operator families. Pure-Python
reimplementations of each operator's math contract, checked against many
generated inputs — the driver oracle pins one corpus; these pin the
algebra."""

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# incremental aggregate maintenance: ANY split of the rows into state/batch
# must combine to the full aggregate (the self-maintainability law behind
# q_incremental_agg — exact because partials are ints/Decimals)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.decimals(
                min_value=0, max_value=99999, places=2, allow_nan=False
            ),
        ),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=300, deadline=None)
def test_partial_combine_equals_full(rows, split):
    split = min(split, len(rows))

    def agg(chunk):
        out: dict[int, tuple[int, object]] = {}
        for k, v in chunk:
            c, s = out.get(k, (0, 0))
            out[k] = (c + 1, s + v)
        return out

    full = agg(rows)
    a, b = agg(rows[:split]), agg(rows[split:])
    combined = {
        k: (
            a.get(k, (0, 0))[0] + b.get(k, (0, 0))[0],
            a.get(k, (0, 0))[1] + b.get(k, (0, 0))[1],
        )
        for k in set(a) | set(b)
    }
    assert combined == full


# ---------------------------------------------------------------------------
# continuous percentile: the positional-interpolation form must be exact
# on the sorted data, monotone in q, and bounded by min/max
# ---------------------------------------------------------------------------
def _pctl_cont(vals, num, den):
    vals = sorted(vals)
    n = len(vals)
    pos_num = (n - 1) * num
    lo, rem = pos_num // den, pos_num % den
    hi = lo if rem == 0 else lo + 1
    return vals[lo] + (vals[hi] - vals[lo]) * (rem / den)


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=300, deadline=None)
def test_percentile_cont_bounds_and_monotonicity(vals):
    p50 = _pctl_cont(vals, 1, 2)
    p90 = _pctl_cont(vals, 9, 10)
    assert min(vals) <= p50 <= max(vals)
    assert min(vals) <= p90 <= max(vals)
    assert p50 <= p90 + 1e-9
    # q=0 and q=1 hit the extremes exactly (positional, no float drift)
    assert _pctl_cont(vals, 0, 1) == min(vals)
    assert _pctl_cont(vals, 1, 1) == max(vals)


# ---------------------------------------------------------------------------
# MAD outliers: the K×MAD rule flags at most half the data minus one
# (median of deviations bounds the flaggable mass), and is
# translation/scale-equivariant
# ---------------------------------------------------------------------------
def _mad_outliers(vals, k=3):
    vals = sorted(vals)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(n + 1) // 2 - 1]
    return [v for v in vals if abs(v - med) > k * mad], med, mad


@given(
    st.lists(
        st.floats(
            min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=80,
    ),
)
@settings(max_examples=300, deadline=None)
def test_mad_outlier_mass_bound(vals):
    out, med, mad = _mad_outliers(vals)
    # at least the lower-median half of deviations is ≤ MAD < K×MAD
    assert len(out) <= len(vals) - (len(vals) + 1) // 2
    assert mad >= 0
    assert min(vals) <= med <= max(vals)


@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=-(10**6), max_value=10**6),
)
@settings(max_examples=300, deadline=None)
def test_mad_outlier_translation_equivariance_exact(vals, shift):
    """Translation equivariance holds in EXACT arithmetic (integers stay
    exact in float64 well below 2^53); with arbitrary floats, v+shift can
    round and legitimately flip borderline flags — which is why the
    operator documents positional selection over data values, not any
    shift-invariance claim."""
    fvals = [float(v) for v in vals]
    out, _, _ = _mad_outliers(fvals)
    out2, _, _ = _mad_outliers([float(v + shift) for v in vals])
    assert len(out2) == len(out)


# ---------------------------------------------------------------------------
# Misra-Gries: the superset guarantee for arbitrary streams and k
# ---------------------------------------------------------------------------
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_guarantee_any_stream(stream, k):
    counters: dict[int, int] = {}
    for t in stream:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k:
            counters[t] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    n = len(stream)
    from collections import Counter

    true = Counter(stream)
    for tok, c in true.items():
        if c > n / k:
            assert tok in counters, (
                f"token {tok} freq {c} > {n}/{k} must survive"
            )


# ---------------------------------------------------------------------------
# PageRank fixed-point: mass is conserved up to bounded floor loss
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_pagerank_fixed_point_mass_conservation(raw_edges):
    scale, d_num, d_den = 10**12, 85, 100
    edges = {(a, b) for a, b in raw_edges if a != b}
    if not edges:
        return
    bi = list(edges) + [(b, a) for a, b in edges]
    nodes = sorted({a for a, _ in bi})
    deg = {v: sum(1 for a, _ in bi if a == v) for v in nodes}
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    teleport = ((d_den - d_num) * (scale // n)) // d_den
    for _ in range(4):
        recv = {v: 0 for v in nodes}
        for a, b in bi:
            recv[b] += r[a] // deg[a]
        r = {v: teleport + (d_num * recv[v]) // d_den for v in nodes}
    total = sum(r.values())
    # each floor division loses < 1 unit per node per round (+ per edge
    # contribution); mass stays within that loss envelope of SCALE
    max_loss = 4 * (len(bi) + 2 * n) + n
    assert scale - max_loss <= total <= scale
    assert all(v > 0 for v in r.values())
