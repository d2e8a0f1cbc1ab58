"""Local replica of the driver's correctness gate: run every registered
query on Spark and its DuckDB oracle side-by-side, compare row count +
column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stream_processing_test_spark.registry import all_queries
from stream_processing_test_spark.session import get_spark
from stream_processing_test_spark.tables import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # canonical row order for order-insensitive compare
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = spec.fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"  {name:28s} rows-only: {len(sdf):7d} rows  [{t_spark:5.1f}s]")
            continue
        ddf = con.execute(spec.oracle).df()
        status = "OK"
        detail = ""
        if len(sdf) != len(ddf):
            status = "ROWCOUNT"
            detail = f"spark={len(sdf)} duckdb={len(ddf)}"
        elif sorted(sdf.columns) != sorted(ddf.columns):
            status = "SCHEMA"
            detail = f"spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}"
        else:
            a, b = normalize(sdf), normalize(ddf)
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                status = "VALUES"
                rows = neq.any(axis=1)
                detail = (
                    f"cols={bad_cols} first_diff:\n"
                    f"spark:\n{a[rows].head(3)}\nduckdb:\n{b[rows].head(3)}"
                )
        mark = "✓" if status == "OK" else "✗"
        print(f"  {mark} {name:28s} {status:8s} {len(sdf):7d} rows [{t_spark:5.1f}s] {detail}")
        if status != "OK":
            failures.append(name)

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
