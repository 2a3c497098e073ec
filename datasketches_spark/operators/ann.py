"""Similarity search over embedding columns (SURVEY task spec: brute-force
cosine top-k baseline + an LSH-bucketed scale path).

Brute-force: query set × corpus cross join with the dot product computed by
``F.zip_with`` + ``F.aggregate`` (JVM-side, codegen). The query side is
small by construction → ``broadcast`` hint, so the "cross" join is a
broadcast nested loop over corpus partitions: embarrassingly parallel, no
shuffle of the corpus. Top-k per query via a window over (query, score).

Scale path: random-hyperplane LSH — sign bits of dot products with
``n_planes`` deterministic hyperplanes form a bucket key; candidates only
need scoring within matching buckets (multi-probe: all buckets within
Hamming distance 1 optionally). Hyperplanes are generated from the seed via
murmur3-keyed Philox so every executor materializes identical planes."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from datasketches_spark.config import DEFAULT_SEED


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k for each query vector: (query_id, vec_id, cosine,
    rank). Ties broken by vec_id for determinism."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.when(
                (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
                _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed, counter=[7, 0, 0, 0]))
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(df: DataFrame, dim: int, n_planes: int = 12,
                    seed: int = DEFAULT_SEED, vec_col: str = "embedding") -> DataFrame:
    """Adds ``bucket``: the sign-bit key of ``n_planes`` random-hyperplane
    projections — computed with built-in array ops against literal plane
    arrays (JVM-side; planes are tiny constants baked into the plan)."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        proj = _dot(F.col(vec_col), plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                    n_planes: int = 12, seed: int = DEFAULT_SEED,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: score only within the query's hyperplane bucket.
    Equi-join on bucket replaces the cross join — at 10^9+ vectors this is
    the difference between a scan per query and a hash lookup."""
    c = with_lsh_bucket(corpus, dim, n_planes, seed, vec_col).select(
        id_col, "bucket", F.col(vec_col).alias("c_vec"), _norm(F.col(vec_col)).alias("c_norm"))
    q = with_lsh_bucket(queries, dim, n_planes, seed, vec_col).select(
        query_id_col, "bucket", F.col(vec_col).alias("q_vec"), _norm(F.col(vec_col)).alias("q_norm"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .withColumn(
            "cosine",
            F.when(
                (F.col("q_norm") > 0) & (F.col("c_norm") > 0),
                _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
