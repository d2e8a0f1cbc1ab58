"""Small-files compaction for append lakes.

A streaming file sink (or the probe connector's one-file-per-batch
append log) fragments a lake into thousands of tiny parquet files;
at 100 TB the scan cost becomes dominated by file-open overhead and
the NameNode/listing pressure, not bytes. ``compact_parquet_dir``
rewrites a directory to a bounded file count with the same rows,
using the crash-safe staging-swap the upsert sink already uses.

Partition-aware: with ``partition_by`` the rewrite preserves (or
introduces) hive-style partitioning — the layout SURVEY §7 prescribes
for the events lake (``day=...``) — and each partition is coalesced
independently, so partition pruning still works after compaction.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from stream_processing_test_spark.sinks.upsert import swap_directory


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet directory at ``path`` down to
    ``target_files`` files (per partition when ``partition_by`` is
    given), atomically-ish via staging + swap. Returns the row count
    (sanity: asserted equal before the swap — a compaction that loses
    rows must never replace the original)."""
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    df = spark.read.parquet(path)
    n_before = df.count()
    staging = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    writer = df.repartition(target_files, *partition_by) if partition_by else df.coalesce(target_files)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    n_after = spark.read.parquet(staging).count()
    if n_after != n_before:
        # never swap in a lossy rewrite; leave the original untouched
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path
        fs = hpath(staging).getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath(staging), True)
        raise RuntimeError(
            f"compaction row mismatch: {n_before} -> {n_after}; aborted"
        )
    swap_directory(spark, staging, path)
    return n_after
