"""Window functions: report pagination (W1+W2) and the top-k-per-group
shape the reference lacks (§2.5 ⊘).

The reference sorts its rollup by ``target_matching_id`` — a *string*
column, so "10" < "9" lexicographically (W1, StreamTest.cpp:940-944) —
then chunks rows into fixed-size report batches (30/30/2, W2,
StreamTest.cpp:516-518, 1239-1243, 572-574) for paced webhook posts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

REPORT_BATCH_SIZE = 30

_BATCHES_ORACLE = f"""
WITH rollup_rows AS (
    SELECT CAST(user_id AS VARCHAR) AS source_id,
           CAST(COUNT(*) AS BIGINT) AS n_detection,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
    FROM events GROUP BY user_id
), numbered AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY source_id) AS rn
    FROM rollup_rows
)
SELECT source_id, n_detection, n_error,
       CAST(rn AS BIGINT) AS rn,
       CAST(floor((rn - 1) / {REPORT_BATCH_SIZE}) AS BIGINT) AS batch_id
FROM numbered
"""


@register(
    "report_batches", oracle=_BATCHES_ORACLE, survey_ops="W1,W2,S10,F5", tier=0
)
def report_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report pagination (W1+W2): rollup → lexicographic sort on the
    string-typed source id (reference parity: ids sort as strings) →
    row_number → fixed-size batch ids.

    Scale note: a global ROW_NUMBER needs a total order — Spark plans
    an exchange to a single partition for the window. That is correct
    for *report* output (the reference pages at most thousands of rows
    into 30-row webhook posts); it is never used in the data plane.
    For large sorted outputs use repartitionByRange + per-partition
    numbering instead (see sinks.reports)."""
    ev = load(spark, sf_dir, "events")
    rollup = ev.groupBy(F.col("user_id").cast("string").alias("source_id")).agg(
        F.count("*").alias("n_detection"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
    )
    w = Window.orderBy("source_id")
    return (
        rollup.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "batch_id", F.floor((F.col("rn") - 1) / REPORT_BATCH_SIZE).cast("long")
        )
    )


_TOPK_ORACLE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       event_type,
       ROUND(value, 6) AS value,
       CAST(rk AS BIGINT) AS rk
FROM (
    SELECT user_id, event_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
    FROM events
) t
WHERE rk <= 3
"""


@register(
    "top_events_per_user", oracle=_TOPK_ORACLE, survey_ops="⊘rank(§2.5),W2", tier=0
)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (absent in the reference, §2.5 ⊘): partitioned
    window + row_number <= k. Deterministic tie-break on event_id.
    Scales linearly: the window partitions by user_id so the sort is
    per-group within hash partitions — no global ordering."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            "rk",
        )
    )


_REPORT_PIPELINE_ORACLE = """
WITH scores AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_detection,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(GREATEST(floor(CAST(COUNT(*) - SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                               / COUNT(*) * 100), 0) AS INT) AS flow_score
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
), failing AS (
    SELECT *, CAST(user_id AS VARCHAR) AS source_id
    FROM scores WHERE flow_score <= 60
), paged AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY source_id) AS rn
    FROM failing
)
SELECT day,
       CAST(floor((rn - 1) / 30) AS BIGINT) AS page,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(MIN(flow_score) AS INT) AS worst_score,
       CAST(SUM(n_error) AS BIGINT) AS total_errors,
       MIN(source_id) AS first_source,
       MAX(source_id) AS last_source
FROM paged
GROUP BY day, floor((rn - 1) / 30)
"""


@register(
    "daily_report_pipeline",
    oracle=_REPORT_PIPELINE_ORACLE,
    survey_ops="A6,A2,W1,W2,S10,T2",
    tier=0,
)
def daily_report_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE EP2 reporting cycle composed as one query
    (StreamTest.cpp:830-1055 score rebuild + :495-607 report emission):
    daily availability scores -> failing-source filter (the <= 60
    threshold of A2/P7) -> lexicographic string-id sort (W1) -> 30-row
    report pages (W2, the S10 batched emitter's unit) -> per-page
    summary the webhook sink would post.

    Composition reuses the registered ``daily_scores`` stage directly
    (one scan, one shuffle on (user_id, day)); pagination windows are
    PARTITIONED BY day, so no global single-partition sort exists
    anywhere in the pipeline — each day's report pages independently.
    The oracle recomposes the same stages in SQL.
    """
    from stream_processing_test_spark.operators.rollup import daily_scores

    failing = (
        daily_scores(spark, sf_dir)
        .filter(F.col("flow_score") <= 60)
        .withColumn("source_id", F.col("user_id").cast("string"))
    )
    w = Window.partitionBy("day").orderBy("source_id")
    paged = failing.withColumn("rn", F.row_number().over(w)).withColumn(
        "page", F.floor((F.col("rn") - 1) / REPORT_BATCH_SIZE).cast("long")
    )
    return paged.groupBy("day", "page").agg(
        F.count("*").alias("n_sources"),
        F.min("flow_score").alias("worst_score"),
        F.sum("n_error").alias("total_errors"),
        F.min("source_id").alias("first_source"),
        F.max("source_id").alias("last_source"),
    )


_PCTRANK_ORACLE = """
WITH totals AS (
    SELECT user_id, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       total_value,
       ROUND(percent_rank() OVER (ORDER BY total_value, user_id), 6) AS pct_rank,
       ROUND(cume_dist() OVER (ORDER BY total_value, user_id), 6) AS cume,
       CAST(ntile(10) OVER (ORDER BY total_value, user_id) AS INT) AS decile
FROM totals
"""


@register(
    "user_value_percentiles",
    oracle=_PCTRANK_ORACLE,
    survey_ops="⊘rank(§2.5),A8",
    tier=2,
)
def user_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of every user by total event value:
    percent_rank, cume_dist and decile over the aggregated totals —
    the §2.5 window functions not yet exercised elsewhere
    (rank/row_number/ntile-by-nation have their own queries).

    Scale design — NO single-partition window. Because the order
    (total_value, user_id) is a unique total order (user_id is the
    group key), rank == row_number, so percent_rank, cume_dist and
    ntile are all closed-form in (rn, N):

        pct_rank = (rn-1)/(N-1)        cume = rn/N
        ntile(k): first N%k tiles get ⌈N/k⌉ rows, the rest ⌊N/k⌋

    The global row_number itself is computed distributively:
    repartitionByRange on the order key -> per-partition row_number
    (window PARTITIONED BY the range-partition id) -> plus an offset
    that is the running sum of partition counts. The offsets frame is
    #shuffle-partitions rows (a k-row seed window, the PLANS.md
    allowance) and broadcasts back; N rides the same tiny frame. Every
    |users|-sized stage stays hash/range-partitioned."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    ranged = totals.repartitionByRange("total_value", "user_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy("total_value", "user_id")
    local = ranged.withColumn("local_rn", F.row_number().over(w_local))
    counts = local.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("offset"),
        F.sum("cnt").over(
            Window.orderBy("pid").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    rn = F.col("local_rn") + F.col("offset")
    n = F.col("n_total")
    base, rem = F.floor(n / 10), n % 10
    threshold = rem * (base + 1)
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "user_id",
            "total_value",
            F.round(
                F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
            ).alias("pct_rank"),
            F.round(rn / n, 6).alias("cume"),
            F.when(rn <= threshold, F.ceil(rn / (base + 1)))
            .otherwise(rem + F.ceil((rn - threshold) / base))
            .cast("int")
            .alias("decile"),
        )
    )
