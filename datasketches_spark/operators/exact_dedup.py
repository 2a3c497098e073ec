"""Exact-duplicate pre-pass: hash-groupBy on sha256(content).

Runs before any sketching — exact duplicates are the cheapest wins and
removing them shrinks the signature stage. sha256 is the per-row invariant
the whole pipeline carries (BASELINE.json: content sha256 equality at every
stage), computed JVM-side with the builtin ``sha2``."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sha256(docs: DataFrame, content_col: str = "content") -> DataFrame:
    return docs.withColumn("sha256", F.sha2(F.col(content_col), 256))


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(sha256, n_dups, rep): content hashes occurring more than once, with
    the minimum doc_id as group representative. Algebraic aggregates only
    → map-side combine, skew-free."""
    return (
        docs.groupBy("sha256")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("rep"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dup_edges(docs: DataFrame, groups: DataFrame | None = None) -> DataFrame:
    """Star edges (group rep → member) feeding connected components."""
    if groups is None:
        groups = exact_dup_groups(docs)
    return (
        docs.select("doc_id", "sha256")
        .join(groups.select("sha256", "rep"), "sha256")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("doc_id").alias("dst"))
    )


def distinct_content_docs(docs: DataFrame) -> DataFrame:
    """One representative per distinct content (the doc with min doc_id);
    downstream sketching runs on these only. Single-shuffle formulation:
    min(doc_id) + first(content) in ONE aggregation — every row in a sha256
    group carries byte-identical content (sha256 of the content IS the
    group key), so first() is exact, and both aggregates combine map-side.
    The previous agg + join-back shuffled the full content column twice."""
    return docs.groupBy("sha256").agg(
        F.min("doc_id").alias("doc_id"), F.first("content").alias("content")
    )
