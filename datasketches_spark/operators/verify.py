"""Candidate verification: estimated Jaccard from the per-document KMV
sketches — entirely in Spark SQL array functions (JVM, whole-stage
codegen), no Python in the hot path.

This is the Spark mapping of the reference's B-over-A ratio machinery
(/root/reference/ThetaCommon/BoundsOnRatiosInThetaSketchedSets.cs:45-103):
for two sketches with thetas θa, θb and entry sets A, B, using
θ = min(θa, θb):

    J ≈ |{A ∩ B} < θ| / |{A ∪ B} < θ|

KMV entries are stored as int64 but every value is < 2^63, so signed and
unsigned comparisons agree and ``array_intersect``/``array_union``/
``least`` operate on the raw bits correctly.

A MinHash slot-agreement estimate is carried alongside as a cross-check
column (fraction of agreeing signature slots is an unbiased Jaccard
estimator)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketches_spark.config import DedupConfig


def _jaccard_cols(cfg: DedupConfig):
    min_theta = F.least(F.col("theta_a"), F.col("theta_b"))
    ka = F.filter(F.col("kmv_a"), lambda x: x < min_theta)
    kb = F.filter(F.col("kmv_b"), lambda x: x < min_theta)
    inter = F.size(F.array_intersect(ka, kb))
    uni = F.size(F.array_union(ka, kb))
    kmv_j = F.when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(F.lit(0.0))
    mh_agree = F.size(
        F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda b: b)
    )
    mh_j = mh_agree.cast("double") / F.lit(float(cfg.num_perm))
    return kmv_j, mh_j


def verify_pairs(pairs: DataFrame, sig: DataFrame, cfg: DedupConfig,
                 left_col: str = "id_a", right_col: str = "id_b",
                 keep_below_threshold: bool = False,
                 participants_hint: int | None = None,
                 participant_broadcast_max: int = 4_000_000) -> DataFrame:
    """pairs(id_a, id_b) × signatures → (id_a, id_b, jaccard_kmv,
    jaccard_minhash) filtered at cfg.jaccard_threshold.

    Two equi-joins against the signature table. The signature rows are WIDE
    (k=4096 KMV entries ≈ 32 KB each), so shuffling the whole table through
    both joins moves ~2 × corpus-size × 32 KB — while the pair list usually
    touches a small fraction of the corpus. When the caller knows an upper
    bound on the number of participating doc ids (``participants_hint``,
    e.g. the pair-table row count off a checkpoint Observation × 2) and it
    is broadcastable, the wide table is first semi-filtered by a BROADCAST
    of the participant ids — the signature table is then only scanned, never
    shuffled at full width; the pair joins shuffle just the participating
    rows. With no hint (or a too-large bound) the plain shuffle joins run
    and AQE picks strategies at runtime.
    """
    s = sig.select(
        F.col("doc_id"),
        F.col("minhash"),
        F.col("kmv_entries"),
        F.col("kmv_theta"),
    )
    if participants_hint is not None and participants_hint <= participant_broadcast_max:
        ids = (
            pairs.select(F.col(left_col).alias("doc_id"))
            .unionByName(pairs.select(F.col(right_col).alias("doc_id")))
            .distinct()
        )
        s = s.join(F.broadcast(ids), "doc_id", "left_semi")
    a = s.select(
        F.col("doc_id").alias(left_col),
        F.col("minhash").alias("mh_a"),
        F.col("kmv_entries").alias("kmv_a"),
        F.col("kmv_theta").alias("theta_a"),
    )
    b = s.select(
        F.col("doc_id").alias(right_col),
        F.col("minhash").alias("mh_b"),
        F.col("kmv_entries").alias("kmv_b"),
        F.col("kmv_theta").alias("theta_b"),
    )
    kmv_j, mh_j = _jaccard_cols(cfg)
    out = (
        pairs.join(a, left_col)
        .join(b, right_col)
        .select(
            left_col,
            right_col,
            kmv_j.alias("jaccard_kmv"),
            mh_j.alias("jaccard_minhash"),
        )
    )
    if not keep_below_threshold:
        out = out.filter(F.col("jaccard_kmv") >= F.lit(cfg.jaccard_threshold))
    return out


def verify_star_edges_with_fallback(bands: DataFrame, stats: DataFrame,
                                    sig: DataFrame, cfg: DedupConfig,
                                    broadcast_eligible: bool = False,
                                    store=None,
                                    store_upstream: list[str] | None = None,
                                    bad_bucket_broadcast_max_bytes: int = 64 * 1024 * 1024,
                                    ) -> DataFrame:
    """Star-edge verification with a per-bucket pair fallback that closes
    the false-positive-representative recall hole: if a bucket's rep r is an
    LSH false positive, edges (r→x, r→y) both fail verification and the true
    pair (x, y) would be lost even though all three shared a bucket. Any
    bucket with a FAILED rep-edge is re-enumerated as full intra-bucket
    pairs (bounded by cfg.bucket_cap) and those pairs verified too.

    Cost is proportional to buckets containing a failed edge — on a clean
    corpus the fallback branch is empty; adversarial buckets pay at most
    cap² verifications. Returns (id_a < id_b, jaccard_kmv, jaccard_minhash)
    at >= cfg.jaccard_threshold.

    ``store``/``store_upstream``: when a CheckpointStore is active, the two
    reused intermediates (verified star edges — one row per candidate edge,
    billions at web scale — and the failed-rep bucket list) are
    materialized as resumable checkpoint sub-stages instead of
    ``localCheckpoint``: executor-local blocks are lost on executor death
    and FAIL the job instead of recomputing, which on a preemptible
    1000-executor cluster is a reliability bug. ``localCheckpoint`` remains
    the store-less (interactive query) path."""
    def _materialize(name: str, compute, upstream: list[str]):
        if store is not None and getattr(store, "enabled", False):
            return store.stage(name, compute, upstream=upstream)
        return compute().localCheckpoint()

    def _n_rows(name: str, df: DataFrame) -> int:
        """Row count of a materialized table: free off the write-job
        Observation in the store path; one cheap count over the already-
        materialized (tiny) localCheckpoint otherwise."""
        if store is not None and getattr(store, "enabled", False):
            n = (store.manifest(name) or {}).get("n_rows")
            if n is not None:
                return int(n)
        return df.count()

    eligible = stats.filter(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= cfg.bucket_cap)
    ).select("band", "bhash", "rep")
    if broadcast_eligible:
        # non-singleton buckets are usually a tiny fraction of all buckets;
        # when the caller KNOWS the count is broadcastable (the pipeline
        # reads it off the bucket_stats write-job Observation), hinting it
        # turns candidate generation into a map-only pass over the bands —
        # no shuffle of the 40x-corpus-sized band table. At true web scale
        # the count is large and the caller leaves this off (shuffle join).
        eligible = F.broadcast(eligible)
    memb = bands.join(eligible, ["band", "bhash"])  # (band, bhash, doc_id, rep)
    # materialize the RAW star edges first (3 longs per row — tiny): the
    # verify subtree then consumes a materialized table instead of
    # re-running candidate generation per consumer, and the edge count
    # (free off the write Observation) bounds the participant-id set so
    # verify_pairs can broadcast-semi-filter the wide signature table
    # instead of shuffling every 32 KB row through two joins.
    ups = store_upstream or []
    star = _materialize(
        "star_edges",
        lambda: (
            memb.filter(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("id_a"), F.col("doc_id").alias("id_b"))
            .distinct()
        ),
        upstream=ups,
    )
    n_star = _n_rows("star_edges", star)
    star_ups = ups + (["star_edges"] if store is not None
                      and getattr(store, "enabled", False) else [])
    # materialize the verified star edges once: passed/failed/fb_pairs all
    # reference this subtree, and Spark re-executes unshared subplans —
    # without this the 2-join verify would run 3-4x.
    star_v = _materialize(
        "star_verified",
        lambda: verify_pairs(star, sig, cfg, keep_below_threshold=True,
                             participants_hint=2 * n_star),
        upstream=star_ups,
    )
    passed = star_v.filter(F.col("jaccard_kmv") >= F.lit(cfg.jaccard_threshold))
    failed = star_v.filter(F.col("jaccard_kmv") < F.lit(cfg.jaccard_threshold))
    # bad_buckets is bounded by failed edges — materialize it so the
    # fallback costs one extra signature-table scan instead of two more
    # bands+stats joins
    bad_buckets = _materialize(
        "bad_buckets",
        lambda: (
            memb.join(
                failed.select(F.col("id_a").alias("rep"), F.col("id_b").alias("doc_id")),
                ["rep", "doc_id"],
            )
            .select("band", "bhash")
            .distinct()
        ),
        upstream=ups + (["star_verified"] if store is not None
                        and getattr(store, "enabled", False) else []),
    )
    # broadcast bad_buckets into the bands re-scan ONLY when its measured
    # row count fits (store path: free via the write-job Observation;
    # store-less path: one cheap count over the materialized tiny table).
    # An adversarial / boilerplate-heavy corpus makes the failed-rep set
    # huge — an unguarded broadcast there is a driver OOM. ~24 B/row.
    if store is not None and getattr(store, "enabled", False):
        n_bad = (store.manifest("bad_buckets") or {}).get("n_rows")
    else:
        n_bad = bad_buckets.count()
    bcast_ok = n_bad is not None and n_bad * 24 < bad_bucket_broadcast_max_bytes
    # bad buckets are eligible by construction (came from memb), so the
    # stats join is not needed again here
    bb = bands.join(F.broadcast(bad_buckets) if bcast_ok else bad_buckets,
                    ["band", "bhash"])
    a = bb.select("band", "bhash", F.col("doc_id").alias("id_a"))
    b = bb.select("band", "bhash", F.col("doc_id").alias("id_b"))
    fb_pairs = _materialize(
        "fb_pairs",
        lambda: (
            a.join(b, ["band", "bhash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .join(passed.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        ),
        upstream=ups + (["star_verified", "bad_buckets"]
                        if store is not None and getattr(store, "enabled", False)
                        else []),
    )
    n_fb = _n_rows("fb_pairs", fb_pairs)
    fb_v = verify_pairs(fb_pairs, sig, cfg, participants_hint=2 * n_fb)
    return (
        passed.unionByName(fb_v).dropDuplicates(["id_a", "id_b"])
    )
