"""Replicates the driver's correctness gate: every queries() entry vs its
oracle_sql() in DuckDB — row count, column names, and order-insensitive
values — at sf0.01 (the driver's own comparison scale)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    got = _normalize(qs[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(sqls[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: cols {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            bad = (~pd.isna(a) | ~pd.isna(b)) & ~(
                pd.isna(a) & pd.isna(b)
            ) & ((a - b).abs() > 1e-9)
            assert not bad.any(), f"{name}.{c}: {got[bad].head()} vs {want[bad].head()}"
        else:
            mism = a.astype(str) != b.astype(str)
            assert not mism.any(), (
                f"{name}.{c}: {got[mism].head(3)} vs {want[mism].head(3)}"
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"task_id", "fetch_seq", "spans"} <= set(df.columns)
