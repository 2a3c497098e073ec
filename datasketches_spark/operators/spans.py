"""Exact common-span verification on candidate pairs (the "suffix-array
substring pass", SURVEY §2C.3): for pairs that share LSH buckets but fail
the whole-document Jaccard threshold, detect embedded duplicated blocks
(license headers, copied functions, block swaps) by the longest common
token span.

Runs ONLY on candidate pairs (post-LSH) — the set is tiny relative to the
corpus, so an applyInPandas stage that re-tokenizes the pair texts is
bounded work. The pair list is repartitioned by hash of the pair before
the Arrow stage to bound per-task batch memory."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datasketches_spark.config import DedupConfig
from datasketches_spark.kernels import shingles, suffix

SPAN_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType(), False),
    T.StructField("id_b", T.LongType(), False),
    T.StructField("common_span_tokens", T.IntegerType(), False),
    T.StructField("containment", T.DoubleType(), False),
])


def verify_spans(pairs: DataFrame, docs: DataFrame, cfg: DedupConfig,
                 id_col: str = "doc_id", content_col: str = "content",
                 max_tokens: int = 1 << 20) -> DataFrame:
    """pairs(id_a, id_b) × docs → (id_a, id_b, common_span_tokens,
    containment). containment = span length / shorter doc token count.

    ``max_tokens`` bounds the per-pair work at O(cap·log cap): token
    sequences longer than the cap are truncated before the span search, so
    one pathological giant pair cannot stall its task. For capped documents
    ``common_span_tokens`` is a lower bound (reported as min(true, cap))
    while ``containment`` still divides by the TRUE shorter-doc length.
    The default (2^20 tokens) is far above any real source file."""
    seed = cfg.seed
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("content"))
    joined = (
        pairs.select("id_a", "id_b")
        .join(d.select(F.col("doc_id").alias("id_a"), F.col("content").alias("text_a")), "id_a")
        .join(d.select(F.col("doc_id").alias("id_b"), F.col("content").alias("text_b")), "id_b")
        # spread pairs evenly over tasks by pair hash: the join output is
        # partitioned by id_b, under which one hot document's pairs (a
        # boilerplate hub) would all land in one task's Arrow batches
        .repartition(F.xxhash64("id_a", "id_b"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            token_lists = shingles.hash_tokens_batch(
                [shingles.tokenize(t or "") for t in pdf["text_a"]]
                + [shingles.tokenize(t or "") for t in pdf["text_b"]],
                seed,
            )
            n = len(pdf)
            spans = np.empty(n, dtype=np.int32)
            cont = np.empty(n, dtype=np.float64)
            for i in range(n):
                ta, tb = token_lists[i], token_lists[n + i]
                spans[i] = suffix.longest_common_span(
                    ta[:max_tokens], tb[:max_tokens])
                m = min(ta.shape[0], tb.shape[0])
                cont[i] = spans[i] / m if m else 0.0
            yield pd.DataFrame({
                "id_a": pdf["id_a"], "id_b": pdf["id_b"],
                "common_span_tokens": spans, "containment": cont,
            })

    return joined.mapInPandas(run, SPAN_SCHEMA)


def span_candidate_pairs(sig: DataFrame, cfg: DedupConfig) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs for the common-span pass from winnowed fingerprints
    (``span_fps`` in the signature table): an equi-join of documents on
    selected fingerprint values. Any pair sharing a token run of
    >= span_window + ngram - 1 tokens shares a fingerprint by the
    winnowing guarantee, so this is the recall-safe, shuffle-on-key
    (skew-capped) scale path — never an all-pairs comparison.

    Fingerprint buckets larger than ``cfg.span_fp_cap`` are boilerplate
    (license headers, codegen preambles) and are dropped + returned for
    logging, mirroring the LSH bucket cap. Buckets are tiny (<= cap), so
    full intra-bucket pair enumeration is bounded by cap²/2 per bucket —
    no star-edge approximation is needed, and pair-level recall inside a
    bucket is exact."""
    fps = sig.select("doc_id", F.explode("span_fps").alias("fp"))
    stats = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("fp_df"))
    eligible = stats.filter((F.col("fp_df") > 1) & (F.col("fp_df") <= cfg.span_fp_cap))
    dropped = stats.filter(F.col("fp_df") > cfg.span_fp_cap)
    memb = fps.join(eligible, "fp")
    a = memb.select("fp", F.col("doc_id").alias("id_a"))
    b = memb.select("fp", F.col("doc_id").alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs, dropped
