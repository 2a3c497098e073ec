"""Round-4 additions: Jaccard confidence bounds surfaced as Spark verify
columns (NumPy parity vs kmv.jaccard), sampling probability p through the
Spark signature path, ANN query-side multi-probe, URI-form store paths,
unconditional Intersection seed validation, CC cache release."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark.config import MAX_THETA_LONG, DedupConfig
from datasketches_spark.kernels import kmv

SEED = DedupConfig().seed


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, content STRING")


def _sketch_of_row(row, seed=SEED):
    e = np.asarray(row["kmv_entries"], dtype=np.int64).view(np.uint64)
    t = int(row["kmv_theta"])
    return kmv.ThetaSketch(t, e, empty=(e.size == 0 and t == kmv.MAX_THETA_LONG),
                           seed=seed)


# ------------------------- Jaccard bounds as verify columns (vs kmv.jaccard)

@pytest.mark.parametrize("k", [16, 4096])
def test_verify_bounds_match_numpy_jaccard(spark, k):
    """jaccard_lb/jaccard_ub from the pure-column bounds machinery must
    match the NumPy kernel twin (kmv.jaccard → ratio_bounds →
    BoundsOnRatiosInThetaSketchedSets.cs) pairwise. k=16 forces the union
    past nominal k, exercising the quickselect pull-back + estimation-mode
    (f < 1) branches; k=4096 stays in exact mode (bounds collapse to the
    estimate)."""
    from datasketches_spark.operators.signatures import build_signatures
    from datasketches_spark.operators.verify import verify_pairs

    cfg = DedupConfig(k=k, jaccard_threshold=0.1)
    rng = np.random.default_rng(5)
    vocab = [f"tok{j}" for j in range(400)]
    texts = []
    for i in range(8):
        words = list(rng.choice(vocab, size=120, replace=False))
        texts.append(" ".join(words))
    # overlapping near-pairs so estimates span (0, 1)
    texts.append(texts[0][: len(texts[0]) // 2] + " zz qq " + texts[1])
    texts.append(texts[2] + " " + texts[3])
    docs = _docs_df(spark, texts)
    sig = build_signatures(docs, cfg).localCheckpoint()
    n = len(texts)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(a + 1, n)],
        "id_a LONG, id_b LONG")
    got = verify_pairs(pairs, sig, cfg, keep_below_threshold=True,
                       with_bounds=True).collect()
    assert len(got) == n * (n - 1) // 2
    sk = {r["doc_id"]: _sketch_of_row(r) for r in sig.collect()}
    for r in got:
        lb, est, ub = kmv.jaccard(sk[r["id_a"]], sk[r["id_b"]], k=cfg.k)
        assert r["jaccard_lb"] == pytest.approx(lb, abs=1e-9), (r, lb, est, ub)
        assert r["jaccard_ub"] == pytest.approx(ub, abs=1e-9), (r, lb, est, ub)
        # the point estimate is the SAME trimmed statistic its bounds bound
        # (kmv.jaccard's est) — and therefore always inside them
        assert r["jaccard_kmv"] == pytest.approx(est, abs=1e-9), (r, lb, est, ub)
        assert r["jaccard_lb"] <= r["jaccard_kmv"] <= r["jaccard_ub"]


def test_verify_bounds_exact_mode_collapse(spark):
    """In exact mode (theta == long.MaxValue, f == 1) the reference
    collapses both bounds to the estimate — the column math must too."""
    from datasketches_spark.operators.signatures import build_signatures
    from datasketches_spark.operators.verify import verify_pairs

    cfg = DedupConfig(jaccard_threshold=0.1)
    texts = ["a b c d e f g h i j k l", "a b c d e f g h i j zz ww"]
    sig = build_signatures(_docs_df(spark, texts), cfg).localCheckpoint()
    pairs = spark.createDataFrame([(0, 1)], "id_a LONG, id_b LONG")
    r = verify_pairs(pairs, sig, cfg, keep_below_threshold=True,
                     with_bounds=True).collect()[0]
    assert r["jaccard_lb"] == r["jaccard_ub"] == pytest.approx(r["jaccard_kmv"])


# ----------------------------- sampling probability p through the Spark path

def test_sampling_p_through_build_signatures(spark):
    """cfg.p < 1 puts every sketch in estimation mode at theta = p * 2^63
    (HeapQuickSelectSketch.cs:73): entries are the sampled fraction, the
    estimate count/|p| still recovers the true distinct count within the
    binomial band, and a doc whose shingles all sample away is non-virgin
    (theta < MaxValue marks data-was-seen)."""
    from datasketches_spark.operators.signatures import build_signatures

    p = 0.25
    cfg = DedupConfig(p=p)
    rng = np.random.default_rng(11)
    text = " ".join(str(x) for x in rng.integers(0, 10**9, size=3000))
    rows = build_signatures(_docs_df(spark, [text, "a"]), cfg).collect()
    by_id = {r["doc_id"]: r for r in rows}
    theta0 = kmv.initial_theta(p)
    big = by_id[0]
    assert big["kmv_theta"] == theta0  # no pull-back below k entries
    entries = np.asarray(big["kmv_entries"], dtype=np.int64).view(np.uint64)
    assert entries.size < big["n_shingles"]  # sampled down
    assert (entries < np.uint64(theta0)).all()
    est = entries.size / (theta0 / float(MAX_THETA_LONG))
    # ~n_shingles p-sampled at p=.25: 5 sigma of sqrt(n p (1-p))/p
    tol = 5 * np.sqrt(big["n_shingles"] * p * (1 - p)) / p
    assert abs(est - big["n_shingles"]) < tol
    # the one-shingle doc: whatever survived, theta must be theta0 and the
    # sketch must NOT be the virgin empty image (data was seen)
    small = by_id[1]
    assert small["kmv_theta"] == theta0 != kmv.MAX_THETA_LONG


def test_config_rejects_bad_p():
    with pytest.raises(ValueError):
        DedupConfig(p=0.0)
    with pytest.raises(ValueError):
        DedupConfig(p=1.5)


# --------------------------------------------------- ANN query multi-probe

def test_cosine_topk_lsh_multi_probe_recovers_boundary_neighbor(spark):
    """Construct a corpus vector that is a reflection of the query across
    its SMALLEST-|dot| hyperplane: bucket Hamming distance exactly 1 with
    cosine ~1. Single-probe provably misses it (bucket equi-join finds no
    row); Hamming-1 multi-probe must rank it first."""
    from datasketches_spark.operators import ann

    dim, n_planes, seed = 8, 6, SEED
    P = ann.hyperplanes(dim, n_planes, seed)  # (n_planes, dim)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(dim)
    dots = P @ v
    i = int(np.argmin(np.abs(dots)))
    p_i = P[i]
    c = v - 2.0 * dots[i] * p_i / (p_i @ p_i)  # exact reflection: flips bit i
    bits_v = (P @ v) > 0
    bits_c = (P @ c) > 0
    assert (bits_v != bits_c).sum() == 1, "construction must flip exactly one bit"
    cos = (v @ c) / (np.linalg.norm(v) * np.linalg.norm(c))
    assert cos > 0.9
    # corpus: the boundary neighbor + decoys in OTHER buckets
    decoys = [rng.standard_normal(dim) for _ in range(20)]
    decoys = [d for d in decoys
              if ((P @ d) > 0).astype(int).tolist() not in
              (bits_v.astype(int).tolist(), bits_c.astype(int).tolist())]
    corpus = spark.createDataFrame(
        [(0, [float(x) for x in c])]
        + [(j + 1, [float(x) for x in d]) for j, d in enumerate(decoys)],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = spark.createDataFrame(
        [(100, [float(x) for x in v])], "query_id LONG, embedding ARRAY<DOUBLE>")
    single = ann.cosine_topk_lsh(corpus, queries, dim, k=3, n_planes=n_planes,
                                 seed=seed).collect()
    assert all(r["vec_id"] != 0 for r in single), \
        "single-probe must miss the across-one-hyperplane neighbor"
    multi = ann.cosine_topk_lsh(corpus, queries, dim, k=3, n_planes=n_planes,
                                seed=seed, multi_probe=True).collect()
    top = [r for r in multi if r["rank"] == 1]
    assert top and top[0]["vec_id"] == 0
    assert top[0]["cosine"] == pytest.approx(cos, abs=1e-6)


# ------------------------------------------ URI-form store spark_path seam

class _FileUriBackend:
    """LocalBackend whose spark_path returns a file:// URI — the shape a
    Hadoop-connector bucket URI (s3a://...) takes. Proves the store's
    Spark-side read/write path handles URI (non-POSIX-path) locations, so
    the one-class-away S3 backend claim holds at the seam."""

    def __init__(self, root):
        from datasketches_spark.plans.storefs import LocalBackend

        self._inner = LocalBackend(root)

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def spark_path(self, key):
        return "file://" + self._inner._p(key)


def test_store_with_uri_form_spark_paths(spark, tmp_path):
    from datasketches_spark.plans.checkpoints import CheckpointStore

    be = _FileUriBackend(str(tmp_path / "bucket"))
    cfg = DedupConfig()
    calls = []

    def compute():
        calls.append(1)
        return spark.range(7).withColumnRenamed("id", "v")

    s1 = CheckpointStore(spark, "uri://ckpt", cfg, input_fp="fp", backend=be)
    out = s1.stage("nums", compute)
    assert out.count() == 7
    assert s1.manifest("nums")["n_rows"] == 7
    s2 = CheckpointStore(spark, "uri://ckpt", cfg, input_fp="fp", backend=be)
    assert s2.stage("nums", compute).count() == 7
    assert len(calls) == 1, "must resume through the URI-form path"


# ------------------------------- Intersection seed check is unconditional

def test_intersection_seed_mismatch_raises_even_when_empty():
    inter = kmv.Intersection(seed=SEED)
    inter.intersect(kmv.empty_sketch(SEED))  # now in the empty state
    with pytest.raises(ValueError, match="seed"):
        inter.intersect(kmv.empty_sketch(SEED + 1))
    fresh = kmv.Intersection(seed=SEED)
    with pytest.raises(ValueError, match="seed"):
        fresh.intersect(kmv.empty_sketch(SEED + 1))


# ------------------------------------------- CC releases round caches

def test_cc_reliable_mode_leaves_no_persistent_rdds(spark, tmp_path):
    """Reliable CC must unpersist the PRE-checkpoint cache of every round
    (unpersisting the checkpointed DataFrame was a no-op that kept every
    round's full edge table cached for the whole run)."""
    from datasketches_spark.operators.connected_components import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src LONG, dst LONG")
    res = connected_components(edges, reliable=True).collect()
    assert {r["cluster_id"] for r in res} == {0}
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    leaked = after - before
    # at most the final round's handle may remain (dropped lazily); every
    # superseded round must be gone
    assert len(leaked) <= 1, f"leaked {len(leaked)} cached round RDDs"
