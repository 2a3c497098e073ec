"""Layer-1 kernel parity for the KMV/theta sketch, mirroring the reference's
test grid (/root/reference/DataSketches.Tests/UnionTests.cs,
IntersectionTests.cs, SerializationTests.cs)."""

import numpy as np
import pytest

from datasketches_spark.config import DEFAULT_SEED, MAX_THETA_LONG
from datasketches_spark.kernels import kmv
from datasketches_spark.kernels.murmur3 import sketch_hash_longs_vec


def hashes_of_range(start: int, n: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Theta-domain hashes of the longs [start, start+n) — same datum
    stream as the reference tests' Update(i) loops."""
    keys = np.arange(start, start + n, dtype=np.uint64).reshape(-1, 1)
    return sketch_hash_longs_vec(keys, seed)


def sk(start, n, k=4096):
    return kmv.build(hashes_of_range(start, n), k=k)


# ---- exact mode (UnionTests.cs:63,87,109: exact equality when count <= k)


def test_exact_mode_estimate_is_exact():
    s = sk(0, 100)
    assert s.theta == MAX_THETA_LONG
    assert s.estimate() == 100.0
    assert s.lower_bound(2) == 100.0
    assert s.upper_bound(2) == 100.0


def test_empty_union_empty():
    u = kmv.union(kmv.empty_sketch(), kmv.empty_sketch())
    assert u.empty and u.estimate() == 0.0 and u.theta == MAX_THETA_LONG


def test_union_one_empty():
    u = kmv.union(sk(0, 6), kmv.empty_sketch())
    assert not u.empty
    assert u.estimate() == 6.0


def test_union_no_overlap_exact():
    u = kmv.union(sk(0, 3), sk(1000, 3))
    assert u.estimate() == 6.0


def test_union_partial_overlap_exact():
    # {0..5} ∪ {3..8} = 9 distinct
    u = kmv.union(sk(0, 6), sk(3, 6))
    assert u.estimate() == 9.0


def test_union_complete_overlap_idempotent():
    u = kmv.union(sk(0, 6), sk(0, 6))
    assert u.estimate() == 6.0


def test_union_many_matches_pairwise_fold():
    parts = [sk(i * 100, 150) for i in range(8)]  # overlapping ranges
    folded = parts[0]
    for p in parts[1:]:
        folded = kmv.union(folded, p)
    allat = kmv.union_many(parts)
    assert allat.theta == folded.theta
    assert np.array_equal(allat.entries, folded.entries)
    assert allat.empty == folded.empty


# ---- estimation mode tolerance (UnionTests.cs:292-316: 10k ∪ 10k with 5k
#      overlap at k=4096 must land in [14000, 16000])


def test_union_estimation_band_reference_scenario():
    a = sk(0, 10_000)
    b = sk(5_000, 10_000)
    assert a.is_estimation_mode() and b.is_estimation_mode()
    u = kmv.union(a, b)
    assert 14_000 <= u.estimate() <= 16_000
    assert u.lower_bound(2) <= 15_000 <= u.upper_bound(2)


def test_build_trims_to_k():
    s = sk(0, 10_000, k=4096)
    assert s.count == 4096
    assert s.theta < MAX_THETA_LONG
    assert int(s.entries.max()) < s.theta
    # estimate within 5 RSE of truth
    assert abs(s.estimate() - 10_000) < 10_000 * 5 * 0.0156


# ---- intersection (IntersectionTests.cs)


def test_intersection_empty_rule_or():
    i = kmv.intersect(sk(0, 6), kmv.empty_sketch())
    assert i.empty and i.estimate() == 0.0


def test_intersection_exact():
    i = kmv.intersect(sk(0, 6), sk(3, 6))  # {3,4,5}
    assert i.estimate() == 3.0


def test_intersection_no_overlap():
    i = kmv.intersect(sk(0, 6), sk(100, 6))
    assert i.estimate() == 0.0
    # exact-mode zero-match collapses to empty (IntersectionImpl.cs:377-381:
    # curCount==0 && theta==MAX → empty=true); round 2 had this inverted
    assert i.empty


def test_intersection_large_overlap_band():
    # IntersectionTests.cs:236-261 style: estimation-mode overlap tolerance
    i = kmv.intersect(sk(0, 10_000), sk(5_000, 10_000))
    est = i.estimate()
    assert 4_300 <= est <= 5_700  # 5k true, generous band ~ +-4 RSE


# ---- AnotB (AnotBImpl.cs semantics)


def test_anotb_exact():
    d = kmv.a_not_b(sk(0, 6), sk(3, 6))  # {0,1,2}
    assert d.estimate() == 3.0


def test_anotb_a_empty():
    d = kmv.a_not_b(kmv.empty_sketch(), sk(0, 6))
    assert d.empty


def test_anotb_b_empty_returns_a():
    a = sk(0, 6)
    d = kmv.a_not_b(a, kmv.empty_sketch())
    assert np.array_equal(d.entries, a.entries) and d.theta == a.theta


def test_anotb_self_is_empty():
    d = kmv.a_not_b(sk(0, 6), sk(0, 6))
    assert d.count == 0 and d.empty


def test_anotb_estimation_mode_not_empty_when_degen():
    a, b = sk(0, 10_000), sk(0, 10_000)
    d = kmv.a_not_b(a, b)
    assert d.count == 0 and not d.empty  # theta < MAX -> degenerate, not empty


# ---- inclusion-exclusion consistency


def test_union_intersect_anotb_partition():
    a, b = sk(0, 8_000), sk(4_000, 8_000)
    u = kmv.union(a, b)
    i = kmv.intersect(a, b)
    ab = kmv.a_not_b(a, b)
    ba = kmv.a_not_b(b, a)
    theta = min(u.theta, i.theta, ab.theta, ba.theta)
    cnt = lambda s: int(np.count_nonzero(s.entries < np.uint64(theta)))
    assert cnt(u) == cnt(i) + cnt(ab) + cnt(ba)


# ---- Jaccard


def test_jaccard_identical():
    lb, est, ub = kmv.jaccard(sk(0, 5_000), sk(0, 5_000))
    assert est == 1.0 and ub == 1.0 and lb > 0.99


def test_jaccard_disjoint():
    lb, est, ub = kmv.jaccard(sk(0, 5_000), sk(10_000, 5_000))
    assert est == 0.0 and lb == 0.0 and ub < 0.01


def test_jaccard_half():
    # |A∩B| = 5k, |A∪B| = 15k -> J = 1/3
    lb, est, ub = kmv.jaccard(sk(0, 10_000), sk(5_000, 10_000))
    assert abs(est - 1 / 3) < 0.03
    assert lb <= est <= ub


# ---- serialization round trips (SerializationTests.cs grid)


@pytest.mark.parametrize("n", [0, 1, 2, 100, 10_000])
def test_serde_round_trip(n):
    s = sk(0, n) if n else kmv.empty_sketch()
    img = kmv.serialize_compact(s)
    r = kmv.deserialize_compact(img)
    assert r.theta == s.theta
    assert r.empty == s.empty
    assert r.count == s.count
    assert np.array_equal(np.sort(r.entries), np.sort(s.entries))
    assert r.estimate() == s.estimate()


def test_empty_image_is_canonical_8_bytes():
    img = kmv.serialize_compact(kmv.empty_sketch())
    assert img == bytes([1, 3, 3, 0, 0, 0x1E, 0, 0])  # EmptyCompactSketch.cs:37


def test_single_item_image_is_16_bytes():
    img = kmv.serialize_compact(sk(0, 1))
    assert len(img) == 16


def test_seed_mismatch_rejected():
    s = sk(0, 10)
    img = kmv.serialize_compact(s)
    with pytest.raises(ValueError, match="seed hash mismatch"):
        kmv.deserialize_compact(img, seed=1234)


def test_merge_seed_mismatch_rejected():
    a = sk(0, 10)
    b = kmv.ThetaSketch(a.theta, a.entries, a.empty, seed=1234)
    with pytest.raises(ValueError, match="seed mismatch"):
        kmv.union(a, b)


# ---- sampling probability p (HeapQuickSelectSketch.cs:73)


def test_sampling_p_estimate_unbiased():
    h = hashes_of_range(0, 50_000)
    s = kmv.build(h, k=4096, p=0.5)
    assert s.is_estimation_mode()
    assert s.theta <= kmv.MAX_THETA_LONG // 2 + 1
    assert abs(s.estimate() - 50_000) < 50_000 * 0.08


def test_sampling_p_small_stream_still_estimates():
    h = hashes_of_range(0, 100)
    s = kmv.build(h, k=4096, p=0.25)
    # ~25 values survive; estimate scales back up by 1/p
    assert 40 <= s.estimate() <= 220
    assert not s.empty


def test_sampling_p_all_sampled_away_not_empty():
    h = hashes_of_range(0, 1)
    s = kmv.build(h, k=4096, p=1e-6)
    assert s.count == 0 and not s.empty
    assert s.upper_bound(2) > 0.0  # noDataSeen=False -> UB exists


def test_sampling_p_validation():
    with pytest.raises(ValueError):
        kmv.build(hashes_of_range(0, 10), p=0.0)
    with pytest.raises(ValueError):
        kmv.build(hashes_of_range(0, 10), p=1.5)
