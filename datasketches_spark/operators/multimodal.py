"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed in
Arrow-batched ``mapInPandas`` stages.

The Spark-side mechanics — schema, partitioning, UDF signatures, batch
shapes — are real and tested. The codec calls themselves are STUBBED
(this container ships no image/audio libraries): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the payload bytes) produces stable
pseudo-features so the distributed plumbing can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("mime", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("payload_sha256", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
])


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: features derived from the sha256
    of the payload. Stable across machines/retries."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, 0]))
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False, dim: int = 64) -> np.ndarray:
    if fake:
        return _fake_decode(payload, dim)
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; pass fake=True to exercise the pipeline plumbing"
    )


def extract_features(media: DataFrame, dim: int = 64, fake: bool = True,
                     target_partitions: int | None = None) -> DataFrame:
    """media table → per-item feature vectors.

    Repartitions by media_id before the Arrow stage so batch memory is
    bounded and independent of upstream partitioning (large binary payloads
    make input-split sizing unreliable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                feats.append(decode_image(b, fake=fake, dim=dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "payload_sha256": shas,
                "feature": feats,
            })

    pruned = media.select("media_id", "kind", "payload")
    if target_partitions:
        pruned = pruned.repartition(target_partitions, "media_id")
    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def synthetic_media(spark, n: int, seed: int = 42, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the id (binary column semantics are what matters, not the codec)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.Generator(np.random.Philox(key=seed, counter=[mid, 1, 0, 0]))
                payload = rng.integers(0, 256, int(64 + rng.integers(0, 192)), dtype=np.uint8).tobytes()
                rows.append((mid, kind, f"{kind}/fake", payload, {"w": "64", "h": "64"}))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "mime", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
