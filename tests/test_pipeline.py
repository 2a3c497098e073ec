"""Layer-3 end-to-end: planted-truth recall, sha256 invariant, resume."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark.config import DedupConfig
from datasketches_spark.kernels import shingles
from datasketches_spark.pipeline import run_dedup
from datasketches_spark.sources.corpus import generate_corpus, truth_pairs

N_FILES = 1000
CFG = DedupConfig(jaccard_threshold=0.8)


@pytest.fixture(scope="module")
def corpus(spark):
    df = generate_corpus(spark, N_FILES, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def result(spark, corpus, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return run_dedup(spark, corpus, CFG, checkpoint_dir=ckpt)


def exact_truth(spark, corpus, threshold):
    """Ground truth via the frozen NumPy oracle: exact shingle Jaccard on
    every planted pair."""
    tp = truth_pairs(spark, N_FILES)
    texts = {r["id"]: r["content"] for r in corpus.select("id", "content").collect()}
    rows = tp.collect()
    out = []
    for r in rows:
        j = shingles.exact_jaccard(texts[r["id_a"]], texts[r["id_b"]], CFG.ngram, CFG.seed)
        out.append((r["id_a"], r["id_b"], r["kind"], j))
    return [(a, b) for a, b, kind, j in out if j >= threshold], out


def test_corpus_deterministic(spark):
    a = generate_corpus(spark, 100, seed=42).orderBy("id").select("content").collect()
    b = generate_corpus(spark, 100, seed=42, partitions=3).orderBy("id").select("content").collect()
    assert a == b


def test_sha256_invariant(result, corpus):
    """Per-row content sha256 equality through the pipeline (BASELINE.json)."""
    expected = corpus.select(F.col("id").alias("doc_id"), F.sha2("content", 256).alias("exp"))
    diff = result.docs.join(expected, "doc_id").filter(F.col("sha256") != F.col("exp")).count()
    assert diff == 0
    assert result.docs.count() == N_FILES


def test_dup_pair_recall(spark, corpus, result):
    """Recall ≥ 0.99 against planted pairs whose exact shingle Jaccard
    clears the threshold, measured at cluster level (a true pair is found
    if both ends land in the same cluster)."""
    truth, detail = exact_truth(spark, corpus, CFG.jaccard_threshold)
    assert len(truth) > 50
    clusters = {r["doc_id"]: r["cluster_id"] for r in result.clusters.collect()}
    hit = sum(1 for a, b in truth if clusters[a] == clusters[b])
    recall = hit / len(truth)
    assert recall >= 0.99, f"recall {recall}: missed {[p for p in truth if clusters[p[0]] != clusters[p[1]]][:10]}"


def test_precision_no_wild_merges(spark, corpus, result):
    """Pairs claimed as near-dups must really be similar: every verified
    edge's exact Jaccard ≥ threshold - estimation slack."""
    edges = result.verified_edges.collect()
    texts = {r["id"]: r["content"] for r in corpus.select("id", "content").collect()}
    assert len(edges) > 0
    bad = []
    for r in edges:
        j = shingles.exact_jaccard(texts[r["id_a"]], texts[r["id_b"]], CFG.ngram, CFG.seed)
        if j < CFG.jaccard_threshold - 0.15:
            bad.append((r["id_a"], r["id_b"], j, r["jaccard_kmv"]))
    assert not bad, bad[:10]


def test_exact_dups_clustered(result):
    """Planted exact pairs (roles 14,15 per 20-id window) share clusters."""
    clusters = {r["doc_id"]: r["cluster_id"] for r in result.clusters.collect()}
    for gid in range(N_FILES // 20):
        a, b = gid * 20 + 14, gid * 20 + 15
        assert clusters[a] == clusters[b]


def test_singletons_stay_single(spark, corpus, result):
    """Documents planted as singletons must not be clustered with anything
    (precision at the cluster level)."""
    from collections import Counter

    clusters = {r["doc_id"]: r["cluster_id"] for r in result.clusters.collect()}
    sizes = Counter(clusters.values())
    singles = [d for d in range(N_FILES) if d % 20 <= 13]
    merged = [d for d in singles if sizes[clusters[d]] > 1]
    assert len(merged) <= max(2, 0.005 * len(singles)), merged[:10]


def test_resume_from_checkpoint(spark, corpus, tmp_path_factory):
    """Second run over the same checkpoint dir resumes every stage and
    produces identical outputs. The corpus goes through parquet first: only
    file-backed inputs have a stable identity (input fingerprint) — an
    in-memory DataFrame deliberately NEVER resumes (see
    test_checkpoint_never_resumes_unfingerprintable_input)."""
    import os

    cpath = str(tmp_path_factory.mktemp("corpus_resume") / "docs")
    corpus.write.mode("overwrite").parquet(cpath)
    corpus = spark.read.parquet(cpath)
    ckpt = str(tmp_path_factory.mktemp("ckpt_resume"))
    r1 = run_dedup(spark, corpus, CFG, checkpoint_dir=ckpt)
    pairs1 = sorted((r["id_a"], r["id_b"]) for r in r1.dup_pairs.collect())
    r2 = run_dedup(spark, corpus, CFG, checkpoint_dir=ckpt)
    import json, os

    with open(os.path.join(ckpt, "metrics.json")) as f:
        m = json.load(f)
    resumed = [s for s in m["lineage"] if s.get("resumed")]
    assert len(resumed) >= 5, m["lineage"]
    pairs2 = sorted((r["id_a"], r["id_b"]) for r in r2.dup_pairs.collect())
    assert pairs1 == pairs2
