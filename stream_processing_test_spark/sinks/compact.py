"""Small-files compaction for append lakes.

A streaming file sink (or the probe connector's one-file-per-batch
append log) fragments a lake into thousands of tiny parquet files;
at 100 TB the scan cost becomes dominated by file-open overhead and
the NameNode/listing pressure, not bytes. ``compact_parquet_dir``
rewrites a directory to a bounded file count with the same rows,
using the crash-safe staging-swap the upsert sink already uses.

Concurrency contract: the input file list is PINNED at the start, and
the directory listing is re-checked immediately before the swap — if a
writer appended files mid-compaction the rewrite ABORTS loudly (stage
cleaned up, original untouched) instead of silently deleting the new
files with the old directory. Callers either quiesce the writer or
retry on ``ConcurrentAppendError``.

Partition-aware: with ``partition_by`` the rewrite preserves the
hive-style layout (each partition ends with at most ``target_files``
files via a deterministic salt — plus any extra files the
``max_records_per_file`` length cap rolls over for skewed
partitions — so partition pruning and write parallelism both
survive). Partition-column type inference is disabled
for the rewrite so numeric-looking string partition values (e.g.
``id=05``) are not coerced and rewritten as different directory names.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.sinks.upsert import swap_directory


class ConcurrentAppendError(RuntimeError):
    """The lake gained files while compaction ran; retry after quiesce."""


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(hpath(path), True)  # recursive: hive partitions
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append(f.getPath().toString())
    return sorted(out)


def _delete(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath(path), True)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` down to
    ``target_files`` files (PER hive partition when ``partition_by``
    is given), via staging + swap. Returns the row count (asserted
    unchanged before the swap — a lossy rewrite never replaces the
    original; a concurrent append aborts with ConcurrentAppendError).

    Size-aware: the salt bounds file COUNT, but a skewed partition
    would still pack its whole hot key into one giant file.
    ``max_records_per_file`` (default: the session's
    ``spark.sql.files.maxRecordsPerFile`` when set, else unbounded)
    caps file LENGTH — Spark's writer rolls a task's output into
    additional files past the cap, so a skewed partition bin-packs
    into ceil(rows / cap) bounded files instead; the ``target_files``
    bound applies to the unskewed case. The unpartitioned path uses a
    round-robin ``repartition`` (not ``coalesce``): the rewrite keeps
    cluster-wide write parallelism and equal-sized outputs at the cost
    of one shuffle — at lake scale the shuffle is cheap next to a
    ``target_files``-task rewrite of everything."""
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    if max_records_per_file is None:
        max_records_per_file = int(
            spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
        )
    files_before = _list_data_files(spark, path)

    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old_infer = spark.conf.get(infer_key)
    spark.conf.set(infer_key, "false")
    staging = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    try:
        df = spark.read.parquet(path)
        n_before = df.count()
        if partition_by:
            # deterministic salt bounds files PER partition at
            # target_files while keeping days × target_files write tasks
            salt = F.pmod(
                F.xxhash64(*[c for c in df.columns]), F.lit(target_files)
            )
            writer = df.repartition(
                *[F.col(c) for c in partition_by], salt
            ).write.mode("overwrite").partitionBy(*partition_by)
        else:
            writer = df.repartition(target_files).write.mode("overwrite")
        if max_records_per_file > 0:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(staging)
        n_after = spark.read.parquet(staging).count()
        if n_after != n_before:
            raise RuntimeError(
                f"compaction row mismatch: {n_before} -> {n_after}; aborted"
            )
        if _list_data_files(spark, path) != files_before:
            raise ConcurrentAppendError(
                f"{path} gained/lost files during compaction; aborted "
                "(quiesce the writer or retry)"
            )
    except BaseException:
        # never orphan the staging dir, whatever failed above
        _delete(spark, staging)
        raise
    finally:
        spark.conf.set(infer_key, old_infer)
    swap_directory(spark, staging, path)
    return n_after
