"""Property-based invariants of the round-9 continuation laws — the
pure-arithmetic cores of q253 (Hamilton apportionment), q255 (S-curve
collision law), q257 (exact integer sqrt), and q260 (total-variation
closeness), exercised over randomized inputs WITHOUT Spark: the laws
are engine-independent by design (that is what makes their oracle
gates exact), so their invariants must hold for any input, not just
the fixtures."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=200, deadline=None)


def _hamilton(counts: list[int], budget: int) -> list[int]:
    """The q253 law: floor quotas + largest remainders (ties by index,
    mirroring the query's lexicographic-lang tiebreak)."""
    total = sum(counts)
    floors = [(budget * c) // total for c in counts]
    rems = [(budget * c) % total for c in counts]
    leftover = budget - sum(floors)
    order = sorted(range(len(counts)), key=lambda i: (-rems[i], i))
    seats = list(floors)
    for i in order[:leftover]:
        seats[i] += 1
    return seats


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=10**5),
)
@_SETTINGS
def test_hamilton_budget_exact_and_quota_rule(counts, budget):
    seats = _hamilton(counts, budget)
    total = sum(counts)
    assert sum(seats) == budget  # the budget is spent EXACTLY
    for c, s in zip(counts, seats):
        q = budget * c / total
        # quota rule: every stratum within 1 of its exact quota
        assert math.floor(q) <= s <= math.floor(q) + 1


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=10**5),
)
@_SETTINGS
def test_hamilton_leftover_bounded_by_strata(counts, budget):
    total = sum(counts)
    floors = [(budget * c) // total for c in counts]
    leftover = budget - sum(floors)
    assert 0 <= leftover < len(counts)


def _pow16(x: float, e: int) -> float:
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    return {1: x, 2: x2, 4: x4, 8: x8, 16: x8 * x8}[e]


_DESIGNS = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))


def _p_micro(j_milli: int, b: int, r: int) -> int:
    s = float(j_milli) / 1000.0
    q1 = 1.0 - _pow16(s, r)
    return math.floor(1000000.0 * (1.0 - _pow16(q1, b)))


@given(j=st.integers(min_value=0, max_value=1000))
@_SETTINGS
def test_scurve_bounded_and_monotone_in_bands(j):
    ps = [_p_micro(j, b, r) for b, r in _DESIGNS]
    for p in ps:
        assert 0 <= p <= 1_000_000
    # fixed budget: more, shorter bands never lose collision probability
    for a, b in zip(ps, ps[1:]):
        assert a >= b
    # endpoints: similarity 0 never collides; similarity 1 always does
    if j == 0:
        assert ps[0] == 0
    if j == 1000:
        assert all(p == 1_000_000 for p in ps)


@given(
    j1=st.integers(min_value=0, max_value=1000),
    j2=st.integers(min_value=0, max_value=1000),
)
@_SETTINGS
def test_scurve_monotone_in_similarity(j1, j2):
    lo, hi = sorted((j1, j2))
    for b, r in _DESIGNS:
        assert _p_micro(lo, b, r) <= _p_micro(hi, b, r)


def _isqrt_corrected(x: int) -> int:
    """The q257 law: float sqrt seed + one-step integer correction."""
    s0 = math.floor(math.sqrt(float(x)))
    if (s0 + 1) * (s0 + 1) <= x:
        return s0 + 1
    if s0 * s0 > x:
        return s0 - 1
    return s0


@given(x=st.integers(min_value=0, max_value=2**52))
@_SETTINGS
def test_isqrt_correction_exact(x):
    w = _isqrt_corrected(x)
    assert w == math.isqrt(x)
    assert w * w <= x < (w + 1) * (w + 1)


@given(
    # a group's lang counts and the rest-of-corpus lang counts over a
    # shared label domain (zero = label absent on that side)
    grp=st.lists(st.integers(min_value=0, max_value=10**4), min_size=1, max_size=8),
    rest=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=8),
)
@_SETTINGS
def test_tvd_milli_bounded_and_zero_iff_proportional(grp, rest):
    n = len(grp)
    rest = (rest + [0] * n)[:n]
    glob = [g + r for g, r in zip(grp, rest)]
    ng, N = sum(grp), sum(glob)
    if ng == 0 or N == 0:
        return
    num = sum(abs(c * N - C * ng) for c, C in zip(grp, glob))
    tvd_milli = (1000 * num) // (2 * ng * N)
    assert 0 <= tvd_milli <= 1000  # total variation is a [0,1] metric
    # a group distributed exactly like the corpus (c_i = k*C_i, so
    # ng = k*N) has distance zero, termwise: c_i*N - C_i*ng == 0
    assert sum(abs(3 * C * N - C * (3 * N)) for C in glob) == 0
