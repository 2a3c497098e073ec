"""Spark-level operator tests: serde round trip, span verify, KMV group
union vs exact, ANN top-k sanity, multimodal plumbing, streaming dedup."""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark.config import DedupConfig
from datasketches_spark.kernels import kmv
from datasketches_spark.operators import serde, spans
from datasketches_spark.operators.signatures import build_signatures, merge_kmv_sketches

CFG = DedupConfig()


@pytest.fixture(scope="module")
def docs(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", F.col("text").alias("content"))
        .cache()
    )
    d.count()
    return d


@pytest.fixture(scope="module")
def sig(spark, docs):
    s = build_signatures(docs, CFG).cache()
    s.count()
    return s


def test_serde_round_trip_through_spark(spark, sig, tmp_path):
    """Serialize KMV columns to SerVer-3 binary, persist to parquet, read
    back, deserialize — estimates and entries preserved bit-exactly."""
    imgs = serde.with_serialized_kmv(sig)
    p = str(tmp_path / "sketches")
    imgs.select("doc_id", "kmv_image").write.parquet(p)
    back = spark.read.parquet(p).withColumn(
        "sk", serde.kmv_deserialize_udf()(F.col("kmv_image"))
    ).select("doc_id", "sk")
    joined = back.join(sig, "doc_id")
    rows = joined.select(
        "doc_id",
        (F.col("sk.kmv_theta") == F.col("kmv_theta")).alias("theta_ok"),
        (F.col("sk.kmv_entries") == F.col("kmv_entries")).alias("entries_ok"),
    ).collect()
    assert rows and all(r["theta_ok"] and r["entries_ok"] for r in rows)


def test_kmv_image_matches_kernel(spark, sig):
    """Spark-side serialization byte-equal to the kernel oracle."""
    row = serde.with_serialized_kmv(sig).select("kmv_entries", "kmv_theta", "kmv_image").first()
    arr = np.asarray(row["kmv_entries"], dtype=np.int64).view(np.uint64)
    sk = kmv.ThetaSketch(row["kmv_theta"], arr,
                         empty=arr.size == 0 and row["kmv_theta"] == kmv.MAX_THETA_LONG)
    assert bytes(row["kmv_image"]) == kmv.serialize_compact(sk)


def test_merge_kmv_matches_exact_distinct(spark):
    """Distributed theta union (applyInPandas two-phase) in exact mode ==
    COUNT(DISTINCT)."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    import pandas as pd

    from datasketches_spark.kernels.murmur3 import sketch_hash_longs_vec

    def to_sketch(itr):
        for pdf in itr:
            for flag, grp in pdf.groupby("l_returnflag"):
                vals = grp["l_suppkey"].to_numpy().astype(np.int64).view(np.uint64).reshape(-1, 1)
                sk = kmv.build(sketch_hash_longs_vec(vals, CFG.seed), k=CFG.k, seed=CFG.seed)
                yield pd.DataFrame({
                    "l_returnflag": [flag],
                    "kmv_entries": [sk.entries.view(np.int64)],
                    "kmv_theta": [np.int64(sk.theta)],
                })

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("kmv_entries", T.ArrayType(T.LongType(), False), False),
        T.StructField("kmv_theta", T.LongType(), False),
    ])
    partials = li.select("l_returnflag", "l_suppkey").repartition(8).mapInPandas(to_sketch, schema)
    merged = merge_kmv_sketches(partials, ["l_returnflag"], CFG)
    got = {r["l_returnflag"]: int(round(r["estimate"])) for r in merged.collect()}
    exp = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_suppkey").alias("n")).collect()
    }
    assert got == exp


def test_verify_spans_finds_planted_block(spark):
    """Block-swap pairs (role 18 shares a 60-token block with role 14) get
    high common-span; unrelated pairs get low."""
    from datasketches_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(spark, 200, seed=42).cache()
    pairs = spark.createDataFrame(
        [(14, 18), (34, 38), (0, 1)], ["id_a", "id_b"]
    )
    out = {
        (r["id_a"], r["id_b"]): r["common_span_tokens"]
        for r in spans.verify_spans(pairs, corpus, CFG, id_col="id").collect()
    }
    assert out[(14, 18)] >= 55
    assert out[(34, 38)] >= 55
    assert out[(0, 1)] <= 10


def test_multimodal_feature_plumbing(spark):
    from datasketches_spark.operators.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, 50, seed=7)
    feats = extract_features(media, dim=16, fake=True, target_partitions=4)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 16 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["payload_sha256"] for r in extract_features(
        synthetic_media(spark, 50, seed=7), dim=16, fake=True).collect()}
    assert all(again[r["media_id"]] == r["payload_sha256"] for r in rows)


def test_ann_lsh_overlaps_exact(spark):
    """Hyperplane-LSH top-k finds the exact top-1 for most queries (same
    bucket) — sanity that the bucketed path is a faithful approximation."""
    from datasketches_spark.operators.ann import cosine_topk, cosine_topk_lsh

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .cache()
    )
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, q, k=1).filter(F.col("rank") == 1).collect()
    approx = cosine_topk_lsh(emb, q, dim=64, k=1, n_planes=8).filter(F.col("rank") == 1).collect()
    # top-1 of a query is the query vector itself (cosine 1.0) and always
    # shares its own bucket -> LSH must find it
    exact_top = {r["query_id"]: r["vec_id"] for r in exact}
    approx_top = {r["query_id"]: r["vec_id"] for r in approx}
    assert all(exact_top[qid] == qid for qid in exact_top)
    assert all(approx_top.get(qid) == qid for qid in exact_top)


def test_streaming_exact_dedup(spark, tmp_path):
    """File-source stream -> watermarked exact dedup -> memory sink."""
    import pandas as pd

    from datasketches_spark.streaming.dedup import stream_exact_dedup

    src = str(tmp_path / "stream_src")
    seed = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "aaa"), (2, "2024-01-01 00:00:01", "bbb"),
         (3, "2024-01-01 00:00:02", "aaa"), (4, "2024-01-01 00:00:03", "ccc")],
        ["doc_id", "ts_s", "content"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    seed.coalesce(1).write.parquet(src)
    schema = "doc_id LONG, content STRING, ts TIMESTAMP"
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_exact_dedup(stream, ts_col="ts")
    qname = f"dedup_sink_{int(time.time()*1000)}"
    query = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    rows = spark.sql(f"SELECT content FROM {qname}").collect()
    contents = sorted(r["content"] for r in rows)
    assert contents == ["aaa", "bbb", "ccc"]


def test_salted_join_equals_exact_pairs(spark, sig):
    """Salted-repartition self-join produces exactly the same candidate
    pair set as the plain bucket self-join (completeness under salting)."""
    from datasketches_spark.operators import lsh

    bands = lsh.band_table(sig, CFG)
    exact = {(r["id_a"], r["id_b"]) for r in lsh.candidate_pairs_exact(bands, CFG).collect()}
    salted = {(r["id_a"], r["id_b"]) for r in lsh.candidate_pairs_salted(bands, CFG, n_salts=4).collect()}
    assert exact == salted
    assert len(exact) > 0
