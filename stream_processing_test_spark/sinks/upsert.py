"""Keyed upsert sink (S6): the reference's ``WriteSqlDbData``
(StreamTest.cpp:134-204) — ``UPDATE live_stream_sources SET ...
WHERE id = ...`` with skip-empty-field semantics — re-expressed as a
join-coalesce-overwrite merge usable from batch code or
``foreachBatch`` in a streaming query.

Reference semantics preserved exactly:
- only non-empty incoming fields overwrite (conditional SET list,
  StreamTest.cpp:151-171) → per-column ``coalesce(new, old)`` after
  ``'' → NULL`` normalization;
- ``flow_score`` and ``resolution_type`` are ALWAYS written
  (StreamTest.cpp:165-168) → listed in ``always_set``;
- rows absent from the update batch pass through unchanged; update
  keys absent from the target are appended (MySQL UPDATE would drop
  them — we keep them and document the deviation: an engine-side
  dimension should accept late-registered sources).

Scale: the merge is one outer join on the key. With a Delta/Iceberg
target this becomes a real MERGE INTO; on plain parquet we
read-join-overwrite, which is atomic per directory-rename and
idempotent for the reference's 1×/day finalization (T8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    always_set: tuple[str, ...] = (),
) -> DataFrame:
    """Pure merge: apply ``updates`` onto ``target`` by ``key``.

    ``updates`` must be unique per ``key`` (like a SQL MERGE source) —
    duplicate keys would multiply rows through the outer join; callers
    reduce first (see streaming.pipeline.finalize_to_dimension).

    - column in ``always_set`` → incoming value wins even when NULL;
    - otherwise → ``coalesce(new, old)`` (skip-empty semantics; callers
      normalize ``'' → NULL`` first — see functions.scalars.blank_to_null);
    - target rows without an update pass through; update rows without a
      target row are appended.
    """
    upd_cols = [c for c in updates.columns if c != key]
    u = updates.select(
        F.col(key).alias(f"__u_{key}"),
        *[F.col(c).alias(f"__u_{c}") for c in upd_cols],
    )
    joined = target.join(u, target[key] == u[f"__u_{key}"], "full_outer")

    out_cols = []
    for c in target.columns:
        if c == key:
            out_cols.append(F.coalesce(F.col(key), F.col(f"__u_{key}")).alias(key))
        elif c in always_set and c in upd_cols:
            # matched row → incoming value wins even if NULL; appended
            # row (no target) → incoming; target-only row → keep old.
            out_cols.append(
                F.when(F.col(f"__u_{key}").isNotNull(), F.col(f"__u_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        elif c in upd_cols:
            out_cols.append(F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    key: str,
    always_set: tuple[str, ...] = (),
) -> None:
    """Read-modify-overwrite upsert for a parquet target directory.

    Plain-parquet stand-in for MERGE INTO: the merged result is
    written distributed to a staging directory (so we never overwrite
    the file we are still reading from), then swapped in via the
    Hadoop FileSystem of the target path — works on local fs and HDFS
    alike (on object stores rename degrades to copy; use a table
    format there). Idempotent — re-running the same batch yields the
    same target (T8 day-end finalization).

    The swap is two renames, NOT one atomic operation: a crash between
    them leaves no target directory but DOES leave the ``__old_*``
    sibling intact — recovery is renaming it back. Readers between the
    renames can observe a missing directory. With a Delta/Iceberg
    target this whole function is one MERGE INTO and the caveat
    disappears."""
    import uuid

    target = spark.read.parquet(target_path)
    merged = merge_upsert(target, updates, key, always_set)
    staging = f"{target_path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    old = f"{target_path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.rename(hpath(target_path), hpath(old)):
        raise IOError(f"rename {target_path} -> {old} failed")
    if not fs.rename(hpath(staging), hpath(target_path)):
        # put the previous target back before failing
        fs.rename(hpath(old), hpath(target_path))
        raise IOError(f"rename {staging} -> {target_path} failed")
    fs.delete(hpath(old), True)


def upsert_jdbc(
    spark: SparkSession,
    updates: DataFrame,
    url: str,
    table: str,
    key: str,
    always_set: tuple[str, ...] = (),
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC form of the S6 keyed upsert — the reference's actual sink
    (``WriteSqlDbData``, StreamTest.cpp:134-204: skip-empty UPDATE
    :151-171 with flow_score/resolution_type always set :165-168,
    against a MySQL table).

    Read the target table over JDBC, apply :func:`merge_upsert`
    (identical skip-empty / always-set semantics), materialize the
    merged result with ``localCheckpoint`` — cutting its lineage off
    the very table we are about to overwrite — then truncate-overwrite
    through the same connection options. Idempotent like the parquet
    form.

    On a dialect with native upsert (MySQL ``INSERT ... ON DUPLICATE
    KEY UPDATE``) a production deployment can push the merge into the
    DB via ``foreachPartition`` instead of rewriting the table; the
    read-merge-write here is the portable form and keeps the merge
    logic in one tested place."""
    from stream_processing_test_spark.sources.jdbc import (
        read_jdbc,
        write_jdbc,
    )

    target = read_jdbc(spark, url, table, properties=properties)
    merged = merge_upsert(target, updates, key, always_set)
    snapshot = merged.localCheckpoint(eager=True)
    write_jdbc(
        snapshot,
        url,
        table,
        mode="overwrite",
        truncate=True,
        properties=properties,
    )


def foreach_batch_upsert(
    target_path: str, key: str, always_set: tuple[str, ...] = ()
):
    """Adapter for ``writeStream.foreachBatch`` — the streaming form of
    S6/T8: each micro-batch's finalized rows merge into the dimension."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(
            batch_df.sparkSession, batch_df, target_path, key, always_set
        )

    return apply
