"""JDBC source/sink adapter (S1/S3 read + S5/S6 write over a SQL DB).

The reference's actual storage is a MySQL database: it scans dimension
and fact tables over JDBC-equivalent client calls (addSqlDbData,
StreamTest.cpp:206-271; per-day scans :348-422, :667-741) and writes
results back with INSERT (:253-255) and skip-empty UPDATE (:151-171).
This module is the Spark-native counterpart: ``spark.read.format
("jdbc")`` / ``df.write.format("jdbc")`` wrappers with the options
that matter at scale, plus a ``load()``-compatible loader so every
registered query can run unchanged against a database instead of
parquet.

Scale posture:

- **Parallel scans.** A plain JDBC read is ONE task pulling the whole
  table through one connection — fine for dimensions, catastrophic for
  facts. ``read_jdbc`` exposes ``partition_column/lower_bound/
  upper_bound/num_partitions`` so the scan fans out into
  ``num_partitions`` range-predicate queries executed by separate
  tasks (mirroring the reference's per-day scan loop, which is exactly
  a manual range partitioning on the date column).
- **Pushdown.** Catalyst pushes filters and column pruning into the
  generated SQL (``PushedFilters`` in the scan node; JDBC sources
  prune via SELECT-list) — the DB does the filtering, not Spark.
- **Batched IO.** ``fetchsize`` (read) and ``batchsize`` (write)
  bound rows-per-roundtrip; both default well above the JDBC driver
  defaults, which are tuned for OLTP cursors, not bulk moves.

Tested against Apache Derby embedded (ships with Spark — no external
service), which exercises the same ``format("jdbc")`` code path any
production driver (MySQL, Postgres) uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_test_spark.tables import TABLE_NAMES


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``table`` (a table name or a ``(subquery) alias``) from a
    JDBC source.

    Pass ``partition_column`` + bounds + ``num_partitions`` for any
    table that doesn't comfortably fit one task: Spark issues
    ``num_partitions`` concurrent range queries instead of one full
    scan. Bounds only steer the split points — rows outside them are
    still read (Spark makes the edge predicates one-sided), so a stale
    min/max is a skew problem, not a correctness problem.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError(
                "partition_column requires lower_bound, upper_bound "
                "and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    truncate: bool = False,
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Write ``df`` to a JDBC table (S5 append / full-refresh form).

    ``mode="append"`` is the reference's INSERT path
    (StreamTest.cpp:253-255). ``mode="overwrite"`` with
    ``truncate=True`` empties and reloads the table while keeping its
    schema/grants/indexes (without it Spark drops and recreates).
    Each task opens its own connection and writes its partition in
    ``batchsize`` batches — the write parallelism IS the partition
    count, so ``df.repartition(n)`` to match the DB's ingest headroom.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", "true" if truncate else "false")
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def jdbc_loader(url: str, properties: dict[str, str] | None = None):
    """A ``tables.load``-compatible loader bound to a JDBC database.

    Returns ``loader(spark, sf_dir, name)`` with the same signature and
    table-name contract as :func:`stream_processing_test_spark.tables.
    load` (the ``sf_dir`` argument is accepted and ignored — the bound
    ``url`` identifies the database), so a query written against the
    parquet loaders runs unchanged against the reference's actual SQL
    storage by dependency injection.
    """

    def loader(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(
                f"unknown table {name!r}; expected one of {TABLE_NAMES}"
            )
        return read_jdbc(spark, url, name, properties=properties)

    return loader
