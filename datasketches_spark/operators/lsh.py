"""LSH banding and candidate generation — all JVM-side DataFrame ops.

Scale design (this is where 10^12-file skew lives or dies):

- Band keys are computed with the builtin ``xxhash64`` over each band's
  row-slice of the MinHash signature (the reference ships the same
  algorithm for exactly this salting/bucketing role,
  /root/reference/Hash/XxHash.cs:48-178; sketch-parity hashing stays
  murmur3). One projection + one ``posexplode`` — no UDF, no shuffle.

- Candidate generation is STAR-EDGE based: each bucket contributes edges
  (min_doc_id_in_bucket → member), i.e. O(bucket size) instead of
  O(bucket size²). The bucket representative comes from a plain
  ``groupBy(band, bhash).agg(min, count)`` — min/count are partially
  aggregatable, so the map-side combine absorbs hot keys (a boilerplate
  clique never concentrates on one reducer). The edge join
  (bands ⋈ bucket_reps) is a many-to-one equi-join that AQE's skew-join
  splitting handles.

- Buckets larger than ``cfg.bucket_cap`` are near-cliques (license
  headers, generated files). They are *dropped from candidate generation
  and logged* to the metrics table — never silently truncated
  (SURVEY §4 custom-optimization 2).

- ``candidate_pairs_exact`` (all pairs per bucket, for moderate buckets /
  oracle checks) enumerates pairs via a self-join on (band, bhash) with
  the cap pre-applied, so the worst bucket contributes cap² pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketches_spark.config import DedupConfig


def band_table(sig: DataFrame, cfg: DedupConfig, sig_col: str = "minhash") -> DataFrame:
    """(doc_id, band, bhash): one row per document per band.

    bhash = xxhash64(band_id, sig[band*rows .. band*rows+rows-1]) — band id
    mixed in so equal row-values in different bands never collide.
    """
    band_cols = []
    for b in range(cfg.bands):
        slice_cols = [F.col(sig_col).getItem(b * cfg.rows + r) for r in range(cfg.rows)]
        band_cols.append(F.xxhash64(F.lit(b), *slice_cols))
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band", "bhash"),
    )


def bucket_stats(bands: DataFrame) -> DataFrame:
    """Per-bucket representative + size. min/count are algebraic aggregates
    → map-side partial aggregation, skew-immune."""
    return bands.groupBy("band", "bhash").agg(
        F.min("doc_id").alias("rep"),
        F.count("*").alias("bucket_size"),
    )


def bucket_histogram(stats: DataFrame) -> DataFrame:
    """log2-bucketed histogram of bucket sizes — the metrics input used to
    choose salt counts / caps at scale."""
    return (
        stats.select(F.floor(F.log2("bucket_size")).cast("int").alias("lg_size"))
        .groupBy("lg_size")
        .agg(F.count("*").alias("n_buckets"))
        .orderBy("lg_size")
    )


def _capped_bands(bands: DataFrame, cfg: DedupConfig,
                  stats: DataFrame | None = None) -> DataFrame:
    """Band rows restricted to ELIGIBLE buckets (size in (1, bucket_cap]) —
    the shared preamble of every pair generator, so the cap rule lives in
    exactly one place."""
    if stats is None:
        stats = bucket_stats(bands)
    eligible = stats.filter(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= cfg.bucket_cap)
    )
    return bands.join(eligible.select("band", "bhash"), ["band", "bhash"])


def candidate_edges(bands: DataFrame, cfg: DedupConfig,
                    stats: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
    """Star edges (src=bucket rep, dst=member), deduplicated across bands.

    Returns (edges, dropped_buckets). ``dropped_buckets`` are the over-cap
    near-cliques, preserved for the metrics/lineage tables.
    """
    if stats is None:
        stats = bucket_stats(bands)
    eligible = stats.filter((F.col("bucket_size") > 1) & (F.col("bucket_size") <= cfg.bucket_cap))
    dropped = stats.filter(F.col("bucket_size") > cfg.bucket_cap)
    edges = (
        bands.join(eligible, ["band", "bhash"])
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )
    return edges, dropped


def candidate_pairs_exact(bands: DataFrame, cfg: DedupConfig,
                          stats: DataFrame | None = None) -> DataFrame:
    """All intra-bucket pairs (id_a < id_b) for buckets within the cap —
    the O(size²) enumeration, used when the full pair list is the product
    (and by the DuckDB oracle checks). Self-join on (band, bhash); AQE
    skew-join splits any residual hot key."""
    capped = _capped_bands(bands, cfg, stats)
    a = capped.select("band", "bhash", F.col("doc_id").alias("id_a"))
    b = capped.select("band", "bhash", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def candidate_pairs_salted(bands: DataFrame, cfg: DedupConfig, n_salts: int = 8,
                           stats: DataFrame | None = None) -> DataFrame:
    """The north-rule salted-repartition hash join: the self-equi-join on
    (band, bhash) with a salt column appended to the key, so one hot bucket
    spreads over ``n_salts`` reducers instead of melting one.

    Left side gets salt = pmod(xxhash64(doc_id), S); right side is
    replicated across all S salt values (explode of a literal salt array),
    so every (x, y) bucket pair meets on exactly one salted key —
    completeness preserved, skew defused at S× replication cost of the
    right side. Same (id_a < id_b) output contract as
    ``candidate_pairs_exact``."""
    capped = _capped_bands(bands, cfg, stats)
    a = capped.select(
        "band", "bhash", F.col("doc_id").alias("id_a"),
        F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).alias("salt"),
    )
    b = capped.select(
        "band", "bhash", F.col("doc_id").alias("id_b"),
        F.explode(F.array(*[F.lit(s) for s in range(n_salts)])).alias("salt"),
    )
    return (
        a.repartition("band", "bhash", "salt")
        .join(b, ["band", "bhash", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_bands(sig: DataFrame, n_tables: int = 4, simhash_col: str = "simhash") -> DataFrame:
    """SimHash LSH: split the 64-bit fingerprint into ``n_tables`` 16-bit
    chunks; near-dups within Hamming distance n_tables-1 share at least one
    chunk (pigeonhole). Pure bit arithmetic, JVM-side."""
    width = 64 // n_tables
    mask = (1 << width) - 1
    chunk_cols = [
        F.shiftrightunsigned(F.col(simhash_col), i * width).bitwiseAND(F.lit(mask))
        for i in range(n_tables)
    ]
    return sig.select("doc_id", F.posexplode(F.array(*chunk_cols)).alias("band", "bhash"))
