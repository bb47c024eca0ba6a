"""Local replica of the driver's correctness gate: run every entry of
``queries()`` on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables, compare row count, schema (column names), and a
value hash with columns sorted by name — flagging mismatches before the
driver does.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return format(v, ".9g")
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        ",".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from crawler_service_spark.queries import ORACLE_SQL, SPARK_QUERIES

    failures = []
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {e}")
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        cols_s, cols_d = sorted(sdf.columns), sorted(ddf.columns)
        if cols_s != cols_d:
            failures.append(name)
            print(f"FAIL  {name}: columns {cols_s} vs {cols_d}")
            continue
        if len(sdf) != len(ddf):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(ddf)}")
            continue
        hs, hd = frame_hash(sdf), frame_hash(ddf)
        if hs != hd:
            failures.append(name)
            print(f"FAIL  {name}: value hash mismatch ({len(sdf)} rows)")
            # show a small diff sample
            m = sdf[sorted(sdf.columns)].round(6) if len(sdf) else sdf
            print(m.head(3).to_string())
            print(ddf[sorted(ddf.columns)].head(3).to_string())
        else:
            print(f"OK    {name} ({len(sdf)} rows)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
