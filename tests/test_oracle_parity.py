"""Layer-2: replicate the driver's DuckDB-oracle comparison locally at
sf0.01 — row count, schema (column names), and order-insensitive value
equality for every query that declares an oracle."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat") or type(v).__module__ == "numpy" and "datetime" in type(v).__name__:
        return str(v)[:10]
    return v


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    recs = df_pandas[cols].to_records(index=False)
    return sorted(tuple(_norm(x) for x in rec) for rec in recs), cols


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got_df = q(spark, SF_DIR).toPandas()
    exp_df = ddb.sql(sql).df()
    got, gcols = _rows(got_df)
    exp, ecols = _rows(exp_df)
    assert gcols == ecols, f"{name}: columns {gcols} != {ecols}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    mism = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mism, f"{name}: {len(mism)} mismatched rows, first 5: {mism[:5]}"


def test_all_queries_run(spark):
    """Every queries() entry (incl. oracle-less ones) executes and yields a
    stable schema with >= 0 rows at sf0.001 (the driver smoke check)."""
    for name, q in entry_mod.queries().items():
        df = q(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "cluster_id", "sha256"}
