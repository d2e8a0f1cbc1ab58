"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

All queries take an ``sf_dir`` (e.g. ``/root/testdata/sf0.01``) and load
only the tables they touch; Catalyst prunes columns/predicates down to
the parquet scan. At production scale the same loaders would point at a
partitioned data lake — events partitioned by ``date(ts)`` so the
daily-window queries prune partitions instead of scanning history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimensions small enough to broadcast at any scale factor (a real
# deployment would re-check against spark.sql.autoBroadcastJoinThreshold).
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read it as a nanos-since-epoch long and convert
        # to a (microsecond) TimestampType column; `div 1000` floors
        # exactly like DuckDB's ns→display truncation, so oracle
        # comparisons at second granularity agree. nanosAsLong is a
        # session default in get_spark(); set here too only as a safety
        # net for externally-built sessions (idempotent, same value).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def literal_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Literal dimension frame via the Arrow/pandas fast path.

    ``spark.createDataFrame(list, ddl)`` goes through slow row-by-row
    py4j conversion (~5-7s even for one row on local); routing through
    pandas keeps literal taxonomy dims sub-second.
    """
    import pandas as pd

    names = [f.split()[0] for f in schema.split(",")]
    pdf = pd.DataFrame(rows, columns=[n.strip() for n in names])
    return spark.createDataFrame(pdf, schema=schema)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
