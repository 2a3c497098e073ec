"""Layer-1 tests for shingling, MinHash, SimHash and the common-span pass."""

import numpy as np
import pytest

from datasketches_spark.config import DEFAULT_SEED
from datasketches_spark.kernels import minhash, shingles, simhash, suffix
from datasketches_spark.kernels.minhash import MERSENNE_P, _mulmod_p


# ---- tokenizer / shingles


def test_tokenize_code():
    assert shingles.tokenize("def f(x):\n  return x+1") == [
        "def", "f", "(", "x", ")", ":", "return", "x", "+", "1",
    ]


def test_shingle_set_deterministic_and_order_sensitive():
    a = shingles.shingle_set("a b c d e f g", 5)
    b = shingles.shingle_set("a b c d e f g", 5)
    c = shingles.shingle_set("g f e d c b a", 5)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_short_doc_still_signs():
    s = shingles.shingle_set("x", 5)
    assert s.size == 1


def test_exact_jaccard_bounds():
    assert shingles.exact_jaccard("a b c d e f", "a b c d e f", 5) == 1.0
    assert shingles.exact_jaccard("a b c d e f", "q r s t u v", 5) == 0.0


def test_hash_tokens_batch_matches_single():
    docs = [["foo", "bar"], ["bar", "baz", "foo"], []]
    out = shingles.hash_tokens_batch(docs)
    from datasketches_spark.kernels.murmur3 import hash128_bytes_vec

    h_foo = hash128_bytes_vec([b"foo"], DEFAULT_SEED)[0][0]
    assert out[0][0] == h_foo and out[1][2] == h_foo
    assert out[2].size == 0


# ---- modular multiply kernel


def test_mulmod_p_against_bigint():
    rng = np.random.default_rng(1)
    a = rng.integers(1, MERSENNE_P, 1000, dtype=np.uint64)
    h = rng.integers(0, MERSENNE_P, 1000, dtype=np.uint64)
    got = _mulmod_p(a, h)
    exp = (a.astype(object) * h.astype(object)) % MERSENNE_P
    assert np.array_equal(got.astype(object), exp)


# ---- minhash


def test_minhash_identical_sets_identical_sigs():
    s = shingles.shingle_set("def f ( x ) : return x + 1 endof", 5)
    s1 = minhash.signature(s, 128)
    s2 = minhash.signature(s.copy(), 128)
    assert np.array_equal(s1, s2)


def _mutate(text, rate, seed):
    rng = np.random.default_rng(seed)
    toks = text.split()
    out = [("Z%d" % rng.integers(1e9)) if rng.random() < rate else t for t in toks]
    return " ".join(out)


def test_minhash_estimate_tracks_true_jaccard():
    rng = np.random.default_rng(7)
    base = " ".join(f"tok{v}" for v in rng.integers(0, 5000, 800))
    for rate in (0.0, 0.02, 0.1, 0.3):
        other = _mutate(base, rate, 11)
        true_j = shingles.exact_jaccard(base, other, 5)
        sa = minhash.signature(shingles.shingle_set(base, 5), 128)
        sb = minhash.signature(shingles.shingle_set(other, 5), 128)
        est = minhash.estimate_jaccard(sa, sb)
        assert abs(est - true_j) < 0.13, (rate, true_j, est)  # ~3/sqrt(128)


def test_band_hashes_equal_iff_band_rows_equal():
    rng = np.random.default_rng(3)
    sigs = rng.integers(0, MERSENNE_P, (2, 128), dtype=np.uint64)
    sigs[1] = sigs[0]
    sigs[1, 64:] = rng.integers(0, MERSENNE_P, 64, dtype=np.uint64)  # bands 8..15 differ
    bh = minhash.band_hashes(sigs, bands=16, rows=8)
    assert np.array_equal(bh[0, :8], bh[1, :8])
    assert not np.any(bh[0, 8:] == bh[1, 8:])


def test_empty_doc_signature_sentinel():
    sig = minhash.signature(np.empty(0, dtype=np.uint64), 16)
    assert np.all(sig == minhash.EMPTY_SENTINEL)


# ---- simhash


def test_simhash_near_dup_small_hamming():
    rng = np.random.default_rng(5)
    base = " ".join(f"tok{v}" for v in rng.integers(0, 5000, 800))
    near = _mutate(base, 0.01, 13)
    far = " ".join(f"other{v}" for v in rng.integers(0, 5000, 800))
    fa = simhash.fingerprint(shingles.shingle_set(base, 5))
    fb = simhash.fingerprint(shingles.shingle_set(near, 5))
    fc = simhash.fingerprint(shingles.shingle_set(far, 5))
    d_near, d_far = int(simhash.hamming(fa, fb)), int(simhash.hamming(fa, fc))
    assert d_near <= 16  # ~1% token mutation -> small bit drift
    assert d_far >= 22  # unrelated content -> ~32 expected
    assert d_near < d_far


def test_hamming_vectorized():
    a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1010], dtype=np.uint64)
    b = np.array([0, 0, 0b0101], dtype=np.uint64)
    assert list(simhash.hamming(a, b)) == [0, 64, 4]


# ---- suffix / common span


def test_longest_common_span_exact():
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint64)
    b = np.array([9, 9, 3, 4, 5, 6, 9, 9, 9], dtype=np.uint64)
    assert suffix.longest_common_span(a, b) == 4  # [3,4,5,6]


def test_longest_common_span_none():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([4, 5, 6], dtype=np.uint64)
    assert suffix.longest_common_span(a, b) == 0


def test_longest_common_span_full():
    a = np.arange(100, dtype=np.uint64)
    assert suffix.longest_common_span(a, a) == 100


def test_containment_embedded_block():
    rng = np.random.default_rng(2)
    block = rng.integers(1, 1 << 62, 50, dtype=np.uint64)
    a = np.concatenate([rng.integers(1, 1 << 62, 30, dtype=np.uint64), block])
    b = np.concatenate([block, rng.integers(1, 1 << 62, 200, dtype=np.uint64)])
    assert suffix.longest_common_span(a, b) == 50
    assert suffix.containment(a, b) == 50 / 80


# ---- batched shingle hashing (the signature stage's hot path)


def test_shingle_hashes_batch_matches_per_doc():
    """Batched gather-and-hash must be bit-identical to the per-doc path
    across every width class: empty, 1..ngram-1 (short-doc single shingle),
    exactly ngram, and long docs."""
    rng = np.random.default_rng(1)
    docs = [["tok%d" % rng.integers(0, 200) for _ in range(n)]
            for n in [0, 1, 2, 3, 4, 5, 6, 50, 337, 4, 0, 1, 1000]]
    th = shingles.hash_tokens_batch(docs, DEFAULT_SEED)
    batched = shingles.shingle_hashes_batch(th, 5, DEFAULT_SEED)
    for i, t in enumerate(th):
        ref = shingles.shingle_hashes(t, 5, DEFAULT_SEED)
        assert batched[i].dtype == np.uint64
        assert np.array_equal(batched[i], ref), f"doc {i}"


def test_shingle_hashes_batch_chunk_boundaries():
    """Chunked window hashing is chunk-size-invariant (boundaries may split
    a document's windows across chunks)."""
    rng = np.random.default_rng(2)
    docs = [["t%d" % rng.integers(0, 50) for _ in range(rng.integers(5, 60))]
            for _ in range(40)]
    th = shingles.hash_tokens_batch(docs, DEFAULT_SEED)
    big = shingles.shingle_hashes_batch(th, 5, DEFAULT_SEED, chunk_windows=1 << 18)
    tiny = shingles.shingle_hashes_batch(th, 5, DEFAULT_SEED, chunk_windows=7)
    for a, b in zip(big, tiny):
        assert np.array_equal(a, b)


def test_hash_tokens_batch_all_empty_docs():
    out = shingles.hash_tokens_batch([[], [], []], DEFAULT_SEED)
    assert len(out) == 3 and all(a.size == 0 for a in out)


def test_minhash_batch_chunk_size_invariant():
    """L2-sized chunking of signatures_batch must not change signatures:
    compare against the unchunked per-doc signature()."""
    rng = np.random.default_rng(3)
    sets = [np.unique(rng.integers(1, 1 << 62, rng.integers(1, 300), dtype=np.uint64))
            for _ in range(50)] + [np.empty(0, dtype=np.uint64)]
    batched = minhash.signatures_batch(sets, 32, DEFAULT_SEED)
    for i, s in enumerate(sets):
        assert np.array_equal(batched[i], minhash.signature(s, 32, DEFAULT_SEED))


def test_simhash_batch_matches_scalar():
    """fingerprints_batch (chunked, reused bit buffer) must equal the
    scalar fingerprint() per document, including empty docs."""
    rng = np.random.default_rng(4)
    sets = [np.unique(rng.integers(1, 1 << 62, rng.integers(1, 300), dtype=np.uint64))
            for _ in range(50)] + [np.empty(0, dtype=np.uint64)]
    batched = simhash.fingerprints_batch(sets)
    for i, s in enumerate(sets):
        assert int(batched[i]) == simhash.fingerprint(s), f"doc {i}"


def test_unique_sets_batch_matches_per_doc():
    """Segmented unique must be bit-identical to per-doc np.unique across
    empty, singleton, all-duplicate and long streams."""
    rng = np.random.default_rng(7)
    streams = [
        np.empty(0, dtype=np.uint64),
        np.array([5], dtype=np.uint64),
        np.array([9, 9, 9, 9], dtype=np.uint64),
        rng.integers(0, 50, size=400).astype(np.uint64),
        rng.integers(0, 2**63 - 1, size=1000).astype(np.uint64),
        np.array([0, 0, 1, 2**63 - 1], dtype=np.uint64),  # reserved values kept here
        np.empty(0, dtype=np.uint64),
    ]
    got = shingles.unique_sets_batch(streams)
    assert len(got) == len(streams)
    for i, s in enumerate(streams):
        assert got[i].dtype == np.uint64
        assert np.array_equal(got[i], np.unique(s)), f"stream {i}"


@pytest.mark.parametrize("k,p", [(16, 1.0), (4096, 1.0), (16, 0.25), (4096, 0.01)])
def test_kmv_build_batch_matches_per_doc(k, p):
    """Vectorized batch build must be bit-identical to per-doc kmv.build:
    entries, theta (incl. the (k+1)-th pull-back and the sampled-away
    non-virgin theta), across empty / tiny / reserved-value / huge sets."""
    from datasketches_spark.kernels import kmv

    rng = np.random.default_rng(13)
    sets = [
        np.empty(0, dtype=np.uint64),
        np.unique(rng.integers(1, 2**63 - 1, size=5).astype(np.uint64)),
        np.unique(rng.integers(1, 2**63 - 1, size=100).astype(np.uint64)),
        np.unique(rng.integers(1, 2**63 - 1, size=20000).astype(np.uint64)),
        np.array([0], dtype=np.uint64),                    # only reserved values
        np.array([0, 2**63 - 1], dtype=np.uint64),
        np.unique(rng.integers(1, 1000, size=64).astype(np.uint64)),  # tiny hashes
        np.empty(0, dtype=np.uint64),
    ]
    entries, thetas = kmv.build_batch(sets, k=k, p=p)
    for i, s in enumerate(sets):
        ref = kmv.build(s, k=k, p=p)
        assert np.array_equal(entries[i], ref.entries), f"set {i}"
        assert int(thetas[i]) == ref.theta, f"set {i}"


def test_unique_sets_batch_regime_invariant():
    """Both dispatch regimes (segmented sort vs per-doc) must produce
    identical outputs on the same input."""
    rng = np.random.default_rng(3)
    streams = [rng.integers(0, 100, size=int(rng.integers(0, 30))).astype(np.uint64)
               for _ in range(50)]
    seg = shingles.unique_sets_batch(streams, segmented_max_mean=10**9)
    per = shingles.unique_sets_batch(streams, segmented_max_mean=0)
    for a, b in zip(seg, per):
        assert np.array_equal(a, b)
