"""Deterministic synthetic source-code corpus generator.

Produces the pipeline input table of `BASELINE.json input_hint` shape —
``(repo string, path string, commit string, lang string, content string)``
— plus planted ground truth (``truth_pairs``, ``truth_clusters``) for
recall measurement (FIXTURES.md §1).

Generation is Spark-distributed (``spark.range`` → ``mapInPandas``) and
fully deterministic: every document's content is a pure function of
``(seed, doc index)`` via counter-based Philox streams, so any partitioning
/ retry / scale-out produces identical bytes. That is the same property the
real pipeline needs for resumability (SURVEY §7 "determinism under retry").

Planted structure, by ``id % 20`` within each 20-id window (gid = id//20):
- roles 0..13  singletons (70%)
- roles 14,15  exact duplicates of each other (10%)
- role 16      near-duplicate of role 14 at target Jaccard cycling
               {0.95, 0.9, 0.8, 0.7} by gid (5%)
- role 17      near-duplicate at target Jaccard 0.9 (5%)
- role 18      block-swap: a 60-token block of role 14's content embedded
               in an unrelated body (5%)
- role 19      boilerplate: a corpus-wide shared license header followed by
               a unique body — the LSH bucket-skew clique (5%)
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGS = ["py", "java", "js", "go", "c"]
JACCARD_TARGETS = [0.95, 0.90, 0.80, 0.70]

# corpus-wide boilerplate header shared by every role-19 document
LICENSE_TOKENS = (
    "licensed to the apache software foundation under one or more contributor "
    "license agreements see the notice file distributed with this work for "
    "additional information regarding copyright ownership"
).split()

CORPUS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])

TRUTH_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType(), False),
    T.StructField("id_b", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("target_jaccard", T.DoubleType(), False),
])


def _rng(seed: int, *counters: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=seed, counter=[0, *counters, 0, 0][:4]))


def _mutation_rate(target_j: float, ngram: int = 5) -> float:
    """Token replacement rate giving ~target Jaccard on ngram shingles:
    surviving shingle fraction s = (1-r)^ngram, J ≈ s/(2-s)."""
    s = 2.0 * target_j / (1.0 + target_j)
    return 1.0 - s ** (1.0 / ngram)


def _base_tokens(seed: int, gid: int) -> list[str]:
    """Deterministic token stream for group gid: identifier-ish tokens over
    a zipf-flavored vocabulary, line-broken to look like code."""
    rng = _rng(seed, 1, gid)
    n = int(60 + rng.integers(0, 340))
    # zipf-ish vocab draw: square a uniform to skew toward common ids
    u = rng.random(n)
    vocab_idx = (u * u * 6000).astype(np.int64)
    return [f"v{v}" for v in vocab_idx]


def _mutate_tokens(tokens: list[str], rate: float, seed: int, doc_id: int) -> list[str]:
    rng = _rng(seed, 2, doc_id)
    mask = rng.random(len(tokens)) < rate
    out = list(tokens)
    for j in np.flatnonzero(mask):
        out[j] = f"u{doc_id}x{j}"
    return out


def _render(tokens: list[str], lang: str) -> str:
    """Join tokens into line-structured pseudo-code (10 tokens per line,
    with a def-like header so the tokenizer sees punctuation too)."""
    lines = [f"def f_{lang} ( a , b ) :"]
    for i in range(0, len(tokens), 10):
        lines.append("    " + " ".join(tokens[i : i + 10]))
    return "\n".join(lines)


def _doc_tokens(seed: int, doc_id: int) -> list[str]:
    gid, role = divmod(doc_id, 20)
    if role <= 13:  # singleton: unique stream keyed by doc id
        return _base_tokens(seed, 10_000_000_000 + doc_id)
    base = _base_tokens(seed, gid)
    if role in (14, 15):
        return base
    if role == 16:
        tj = JACCARD_TARGETS[gid % len(JACCARD_TARGETS)]
        return _mutate_tokens(base, _mutation_rate(tj), seed, doc_id)
    if role == 17:
        return _mutate_tokens(base, _mutation_rate(0.90), seed, doc_id)
    if role == 18:  # block swap: 60-token block of base inside unique body
        body = _base_tokens(seed, 20_000_000_000 + doc_id)
        block = base[:60]
        mid = len(body) // 2
        return body[:mid] + block + body[mid:]
    # role 19: boilerplate clique
    body = _base_tokens(seed, 30_000_000_000 + doc_id)
    return LICENSE_TOKENS + body[:80]


def _hex40(seed: int, doc_id: int) -> str:
    rng = _rng(seed, 3, doc_id)
    return bytes(rng.integers(0, 256, 20, dtype=np.uint8)).hex()


def generate_corpus(spark: SparkSession, n_files: int, seed: int = 42,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_files`` documents."""
    if partitions is None:
        partitions = max(8, min(256, n_files // 2000 or 8))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for doc_id in ids:
                doc_id = int(doc_id)
                gid, role = divmod(doc_id, 20)
                # planted-duplicate roles share the group's lang so that
                # exact-dup pairs are byte-identical (incl. the rendered
                # header); singletons vary lang per doc
                lang = LANGS[(gid if role >= 14 else doc_id) % len(LANGS)]
                toks = _doc_tokens(seed, doc_id)
                # zipfian-ish repo sizes: many files map to low repo indices
                r = (gid * 2654435761) % 10_000
                repo_idx = int((r / 10_000.0) ** 2 * 499)
                rows.append((
                    doc_id,
                    f"org{repo_idx:03d}/repo{gid % 7}",
                    f"src/pkg{doc_id % 23}/mod_{doc_id}.{lang}",
                    _hex40(seed, doc_id),
                    lang,
                    _render(toks, lang),
                ))
            yield pd.DataFrame(rows, columns=["id", "repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_files, numPartitions=partitions).mapInPandas(gen, CORPUS_SCHEMA)


def truth_pairs(spark: SparkSession, n_files: int) -> DataFrame:
    """Planted duplicate pairs with their construction kind and intended
    Jaccard. ``target_jaccard`` is the design target; tests recompute exact
    shingle Jaccard with the NumPy oracle where exactness matters."""
    n_groups = n_files // 20
    g = spark.range(0, n_groups).withColumnRenamed("id", "gid")
    base = F.col("gid") * 20
    pairs = []
    mk = lambda a, b, kind, tj: g.select(
        (base + a).alias("id_a"), (base + b).alias("id_b"),
        F.lit(kind).alias("kind"), tj.alias("target_jaccard"))
    tj_16 = F.element_at(
        F.array(*[F.lit(v) for v in JACCARD_TARGETS]),
        (F.col("gid") % len(JACCARD_TARGETS) + 1).cast("int"))
    pairs.append(mk(14, 15, "exact", F.lit(1.0)))
    pairs.append(mk(14, 16, "near", tj_16))
    pairs.append(mk(15, 16, "near", tj_16))
    pairs.append(mk(14, 17, "near", F.lit(0.90)))
    pairs.append(mk(15, 17, "near", F.lit(0.90)))
    # 16 and 17 are independent mutations of the same base: J ~ J16 * J17
    pairs.append(mk(16, 17, "near", tj_16 * 0.90))
    pairs.append(mk(14, 18, "block_swap", F.lit(0.0)))
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("id_b") < n_files)
