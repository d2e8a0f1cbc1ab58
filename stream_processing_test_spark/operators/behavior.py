"""Behavioral analytics over the events stream: cohort retention and
ordered funnel conversion — the two canonical product-analytics
queries every events warehouse serves, absent from the reference but
squarely inside this engine's extension charter (SURVEY §7).

Both are pure relational compositions (conditional aggregation +
joins), shuffle-bounded by |users|, and DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

_RETENTION_ORACLE = """
WITH activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
), cohorts AS (
    SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN cohorts c USING (user_id)
GROUP BY c.cohort_day, a.day - c.cohort_day
"""


@register(
    "cohort_retention", oracle=_RETENTION_ORACLE, survey_ops="A5,A8,J1,F2", tier=2
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active
    day; for each (cohort, day-offset) cell, how many of that cohort
    were active again N days later.

    Two aggregations over the distinct (user, day) activity set — the
    cohort-assignment side is |users| rows, which grows with the fact
    table, so the back-join carries NO broadcast hint: AQE broadcasts
    when the runtime size is small and falls back to a shuffle join on
    user_id otherwise (both sides already hash-partitioned on user_id
    from their aggregations, so the shuffle is often elided). The wide
    work is one distinct over (user, day), partial-aggregated in the
    scan stage. At 100 TB the activity set is the materialized view a
    warehouse would maintain incrementally."""
    ev = load(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_FUNNEL_ORACLE = """
WITH t1 AS (
    SELECT user_id, MIN(ts) AS t_click FROM events
    WHERE event_type = 'click' GROUP BY user_id
), t2 AS (
    SELECT e.user_id, MIN(e.ts) AS t_signup
    FROM events e JOIN t1 USING (user_id)
    WHERE e.event_type = 'signup' AND e.ts > t1.t_click
    GROUP BY e.user_id
), t3 AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM events e JOIN t2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > t2.t_signup
    GROUP BY e.user_id
)
SELECT stage, n_users FROM (
    SELECT 'click' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users, 1 AS ord FROM t1
    UNION ALL
    SELECT 'signup_after_click', CAST(COUNT(*) AS BIGINT), 2 FROM t2
    UNION ALL
    SELECT 'purchase_after_signup', CAST(COUNT(*) AS BIGINT), 3 FROM t3
) ORDER BY ord
"""


@register(
    "funnel_conversion", oracle=_FUNNEL_ORACLE, survey_ops="A2,A8,J2,P2", tier=2
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: click → signup (strictly after the user's first
    click) → purchase (strictly after that signup); one row per stage
    with the surviving user count.

    Each stage is a conditional MIN per user joined back to the events
    scan with the stage predicate pushed down. The per-stage frames
    are |users| rows — fact-scaled — so the joins carry NO broadcast
    hint: AQE broadcasts a stage frame only when its runtime size is
    actually small, and otherwise shuffle-joins on user_id (the stage
    frames are already hash-partitioned on user_id by their groupBy).
    The strict event-time ordering (not mere co-occurrence) is what
    makes this a funnel rather than three independent filters."""
    ev = load(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "signup")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = lambda df, name: df.agg(F.count("*").alias("n_users")).select(
        F.lit(name).alias("stage"), "n_users"
    )
    return (
        stage(t1, "click")
        .unionAll(stage(t2, "signup_after_click"))
        .unionAll(stage(t3, "purchase_after_signup"))
    )
