"""SQL-text query surface.

The reference's queries are literal SQL strings executed by MySQL
(SURVEY.md §3: "no parser, no logical plan — every query is a
hand-built SQL string"). Our engine gets a full ANSI-SQL parser for
free via ``spark.sql``; this module demonstrates that surface: tables
registered as temp views, query expressed as SQL text, same Catalyst
plan (and the same pushdown/pruning) as the DataFrame API.

Users of the reference who carry SQL strings can run them unchanged
apart from MySQL→Spark dialect differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

_DAILY_SQL_SPARK = """
SELECT date_format(ts, 'yyyy-MM-dd') AS day,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / CAST(100 AS DOUBLE), 2)
           AS total_value
FROM events_v
GROUP BY date_format(ts, 'yyyy-MM-dd'), event_type
"""

_DAILY_SQL_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2)
           AS total_value
FROM events
GROUP BY strftime(ts, '%Y-%m-%d'), event_type
"""


@register("sql_daily_event_summary", oracle=_DAILY_SQL_ORACLE, survey_ops="§3-sql-text,A1,A8,F2")
def sql_daily_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event summary written as SQL TEXT (not the
    DataFrame API): the events table is registered as a temp view and
    the query string goes through Spark's parser → Catalyst, proving
    reference-style SQL strings run as-is. Values are summed in exact
    integer cents (see stats.balance_quartiles for why). Dialect trap
    made explicit: in Spark SQL TEXT a `100.0` literal is DECIMAL(4,1)
    (the DataFrame API's lit(100.0) is DOUBLE), which would propagate
    Decimal into the result type — hence CAST(100 AS DOUBLE)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(_DAILY_SQL_SPARK)
