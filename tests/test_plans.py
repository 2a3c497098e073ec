"""Physical-plan audits: the scale properties the pipeline claims must be
visible in the plans Catalyst actually produces — predicate pushdown into
the parquet scan, column pruning (content/text never read when unused),
broadcast of small dimensions, and no Python in JVM-only operators."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_filter_pushdown_reaches_parquet(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 60).select("doc_id")
    plan = full_plan(d)
    assert "PushedFilters" in plan and "LessThan(doc_id,60)" in plan, plan


def test_column_pruning_skips_text(spark):
    """A projection that never touches `text` must not read it: the scan's
    ReadSchema should contain only the selected columns."""
    d = spark.read.parquet(f"{SF}/documents.parquet").groupBy("lang").count()
    plan = full_plan(d)
    import re

    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "text" not in m.group(1), m.group(1) if m else plan


def test_revenue_join_broadcasts_nation(spark):
    df = entry_mod._q_revenue_by_nation(spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_verify_is_jvm_only(spark):
    """KMV Jaccard verification must contain no Python evaluation —
    array_intersect/zip_with run in the JVM."""
    from datasketches_spark.config import DedupConfig
    from datasketches_spark.operators import verify

    cfg = DedupConfig()
    sig = spark.createDataFrame(
        [(1, [1, 2], [10, 20], 100), (2, [1, 3], [10, 30], 100)],
        "doc_id LONG, minhash ARRAY<LONG>, kmv_entries ARRAY<LONG>, kmv_theta LONG",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")
    out = verify.verify_pairs(pairs, sig, cfg, keep_below_threshold=True)
    plan = physical_plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_band_table_is_jvm_only(spark):
    from datasketches_spark.config import DedupConfig
    from datasketches_spark.operators import lsh

    cfg = DedupConfig(bands=2, rows=2)
    sig = spark.createDataFrame([(1, [1, 2, 3, 4])], "doc_id LONG, minhash ARRAY<LONG>")
    plan = physical_plan(lsh.band_table(sig, cfg))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_aggregation_has_map_side_combine(spark):
    """The pricing summary must do partial (map-side) aggregation before
    the exchange — the property that makes hot grouping keys skew-immune.
    (WholeStageCodegen spans only appear in the post-execution AQE plan,
    so we assert the partial-agg structure instead.)"""
    df = entry_mod._q_pricing_summary(spark, SF)
    plan = physical_plan(df)
    assert "partial_sum" in plan and "Exchange hashpartitioning" in plan, plan


def test_bucket_stats_has_map_side_combine(spark):
    from datasketches_spark.config import DedupConfig
    from datasketches_spark.operators import lsh

    cfg = DedupConfig(bands=2, rows=2)
    sig = spark.createDataFrame([(1, [1, 2, 3, 4])], "doc_id LONG, minhash ARRAY<LONG>")
    plan = physical_plan(lsh.bucket_stats(lsh.band_table(sig, cfg)))
    assert "partial_min" in plan or "partial_count" in plan, plan
