"""The reference's set-operation corner-case matrix
(/root/reference/ThetaCommon/SetOperationCornerCases.cs:38-100): inputs of
the four archetypes Empty / Exact / Estimation / Degenerate crossed 4x4,
for union, intersection and A-not-B — asserting the empty-flag and theta
rules hold in every cell (SURVEY §2A K24: "encode as unit-test matrix")."""

import numpy as np
import pytest

from datasketches_spark.config import MAX_THETA_LONG
from datasketches_spark.kernels import kmv

K = 16
SMALL_THETA = MAX_THETA_LONG // 4


def _entries(vals):
    return np.array(sorted(vals), dtype=np.uint64)


ARCHETYPES = {
    # Empty: virgin — theta = MAX, no entries
    "empty": kmv.empty_sketch(),
    # Exact: theta = MAX, entries present
    "exact": kmv.ThetaSketch(MAX_THETA_LONG, _entries([10, 20, 30]), False),
    # Estimation: theta < MAX, entries below theta
    "est": kmv.ThetaSketch(SMALL_THETA, _entries([11, 21, 31]), False),
    # Degenerate: theta < MAX, zero entries, NOT empty (data was seen)
    "degen": kmv.ThetaSketch(SMALL_THETA, _entries([]), False),
}
NAMES = list(ARCHETYPES)


def _check_invariants(s: kmv.ThetaSketch):
    assert 1 <= s.theta <= MAX_THETA_LONG
    assert np.all(s.entries < np.uint64(s.theta))
    assert np.array_equal(s.entries, np.unique(s.entries))  # sorted distinct
    if s.empty:
        assert s.count == 0 and s.theta == MAX_THETA_LONG


@pytest.mark.parametrize("a", NAMES)
@pytest.mark.parametrize("b", NAMES)
def test_union_matrix(a, b):
    sa, sb = ARCHETYPES[a], ARCHETYPES[b]
    u = kmv.union(sa, sb, k=K)
    _check_invariants(u)
    # Union empty rule: AND (UnionImpl.cs:234)
    assert u.empty == (sa.empty and sb.empty)
    # theta rule: min (no pull-back at these sizes)
    assert u.theta == min(sa.theta, sb.theta)
    t = np.uint64(u.theta)
    expect = np.union1d(sa.entries[sa.entries < t], sb.entries[sb.entries < t])
    assert np.array_equal(u.entries, expect)


@pytest.mark.parametrize("a", NAMES)
@pytest.mark.parametrize("b", NAMES)
def test_intersection_matrix(a, b):
    sa, sb = ARCHETYPES[a], ARCHETYPES[b]
    i = kmv.intersect(sa, sb)
    _check_invariants(i)
    # Intersection empty rule: OR (IntersectionImpl.cs:152-157)
    assert i.empty == (sa.empty or sb.empty)
    if not i.empty:
        assert i.theta == min(sa.theta, sb.theta)
        t = np.uint64(i.theta)
        expect = np.intersect1d(sa.entries, sb.entries)
        assert np.array_equal(i.entries, expect[expect < t])


@pytest.mark.parametrize("a", NAMES)
@pytest.mark.parametrize("b", NAMES)
def test_anotb_matrix(a, b):
    sa, sb = ARCHETYPES[a], ARCHETYPES[b]
    d = kmv.a_not_b(sa, sb)
    _check_invariants(d)
    if sa.empty:
        assert d.empty  # AnotBImpl.cs:64-69
    elif sb.empty:
        # result is A itself (AnotBImpl.cs:122-126)
        assert d.theta == sa.theta and np.array_equal(d.entries, sa.entries)
    else:
        theta = min(sa.theta, sb.theta)
        assert d.theta == theta
        t = np.uint64(theta)
        expect = np.setdiff1d(sa.entries[sa.entries < t], sb.entries)
        assert np.array_equal(d.entries, expect)
        # empty iff nothing survives at theta == MAX (AnotBImpl.cs:90,140)
        assert d.empty == (d.count == 0 and theta == MAX_THETA_LONG)
