"""Structured Streaming flavors of the dedup operators.

The theta/KMV sketch is a one-pass streaming structure by construction
(the reference's UpdateSketch is exactly an unbounded-stream consumer);
on Spark the natural mapping is:

- ``stream_with_sha256`` + ``stream_exact_dedup``: exact duplicate drop on
  content hash with watermarked state (dropDuplicatesWithinWatermark), so
  state is bounded by the lateness horizon.
- ``stream_signatures``: the same Arrow-batched signature stage as batch
  (mapInPandas is micro-batch-transparent) — emits the signature table
  incrementally for downstream batch LSH.
- ``stream_distinct_estimate``: windowed approx-distinct per event-time
  window using Spark's own HLL++ (approx_count_distinct) as the
  streaming-native cross-check metric (NOT sketch-parity; the parity path
  checkpoints KMV partials via stream_signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketches_spark.config import DedupConfig
from datasketches_spark.operators.signatures import build_signatures


def stream_with_sha256(stream: DataFrame, content_col: str = "content") -> DataFrame:
    return stream.withColumn("sha256", F.sha2(F.col(content_col), 256))


def stream_exact_dedup(stream: DataFrame, ts_col: str = "ts",
                       watermark: str = "10 minutes",
                       content_col: str = "content") -> DataFrame:
    """Keep the first arrival of each distinct content within the
    watermark horizon; state for a hash is dropped once the watermark
    passes it (bounded state at any corpus rate)."""
    hashed = stream_with_sha256(stream, content_col)
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["sha256"])


def stream_signatures(stream: DataFrame, cfg: DedupConfig,
                      id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    return build_signatures(stream, cfg, id_col=id_col, content_col=content_col)


def stream_distinct_estimate(stream: DataFrame, ts_col: str, value_col: str,
                             window: str = "1 minute",
                             watermark: str = "5 minutes") -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.approx_count_distinct(value_col).alias("approx_distinct"),
             F.count("*").alias("n_rows"))
        .select(F.col("w.start").alias("window_start"), "approx_distinct", "n_rows")
    )
