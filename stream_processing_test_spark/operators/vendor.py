"""Vendor flow-quality histogram — the reference's ``GetVendorFlowStats``
(StreamTest.cpp:441-464) re-expressed over the driver's synthetic tables.

Reference shape: a derived-table subquery labels each source with a
vendor via LIKE-prefix CASE (P3), filters the dimension (P1), restricts
to an IN-list of vendors (P4), then bucket-counts scores with
SUM(CASE WHEN ...) conditional aggregation (A1) and derives percentage
columns (A7). Edge semantics preserved exactly: bucket edges 60/80/100
are inclusive as in the reference (P7), and scores > 100 fall in NO
bucket but still count in ``total``.

Synthetic mapping (FIXTURES.md §2): customer ⇒ live_stream_sources;
``c_mktsegment`` prefix ⇒ url vendor prefix; floor(c_acctbal) % 111 ⇒
flow_score (yields 0..110, exercising the >100 no-bucket edge).

Scale: single hash-aggregate over the dimension table — partial
aggregation map-side, one shuffle on the (tiny-cardinality) vendor key.
No join. At 100 TB the dimension is millions of rows at most; this is
sub-second on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

VENDOR_A = "Vendor 278172839.xyz"
VENDOR_B = "Vendor estengo.com"

_ORACLE = f"""
WITH scored AS (
    SELECT CASE WHEN c_mktsegment LIKE 'BUILD%' THEN '{VENDOR_A}'
                WHEN c_mktsegment LIKE 'AUTO%'  THEN '{VENDOR_B}'
                ELSE 'Other' END AS vendor,
           CAST(floor(c_acctbal) AS INT) % 111 AS flow_score
    FROM customer
    WHERE c_acctbal > 0 AND c_mktsegment <> 'MACHINERY' AND c_custkey >= 37
), agg AS (
    SELECT vendor,
           CAST(SUM(CASE WHEN flow_score < 60 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_lt60,
           CAST(SUM(CASE WHEN flow_score BETWEEN 60 AND 80 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_60_80,
           CAST(SUM(CASE WHEN flow_score > 80 AND flow_score <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_80_100,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM scored
    WHERE vendor IN ('{VENDOR_A}', '{VENDOR_B}')
    GROUP BY vendor
)
SELECT vendor, cnt_lt60, cnt_60_80, cnt_80_100, total,
       ROUND(CASE WHEN total > 0 THEN cnt_lt60  * 100.0 / total ELSE 0 END, 4) AS pct_lt60,
       ROUND(CASE WHEN total > 0 THEN cnt_60_80 * 100.0 / total ELSE 0 END, 4) AS pct_60_80,
       ROUND(CASE WHEN total > 0 THEN cnt_80_100 * 100.0 / total ELSE 0 END, 4) AS pct_80_100
FROM agg
"""


@register("vendor_flow_stats", oracle=_ORACLE, survey_ops="P1,P3,P4,P7,A1,A7,F12")
def vendor_flow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")

    scored = (
        customer
        # P1 — conjunctive dimension filter (pushed to the parquet scan)
        .filter(
            (F.col("c_acctbal") > 0)
            & (F.col("c_mktsegment") != "MACHINERY")
            & (F.col("c_custkey") >= 37)
        )
        .select(
            # P3 — LIKE-prefix vendor classification (CASE WHEN chain)
            F.when(F.col("c_mktsegment").like("BUILD%"), VENDOR_A)
            .when(F.col("c_mktsegment").like("AUTO%"), VENDOR_B)
            .otherwise("Other")
            .alias("vendor"),
            (F.floor("c_acctbal").cast("int") % 111).alias("flow_score"),
        )
        # P4 — IN-list vendor filter
        .filter(F.col("vendor").isin(VENDOR_A, VENDOR_B))
    )

    score = F.col("flow_score")
    agg = scored.groupBy("vendor").agg(
        # A1 — conditional bucket counts; edges 60/80/100 inclusive per P7
        F.sum(F.when(score < 60, 1).otherwise(0)).alias("cnt_lt60"),
        F.sum(F.when(score.between(60, 80), 1).otherwise(0)).alias("cnt_60_80"),
        F.sum(F.when((score > 80) & (score <= 100), 1).otherwise(0)).alias("cnt_80_100"),
        F.count("*").alias("total"),
    )

    # A7 — percentage post-aggregates with divide-by-zero guard
    def pct(cnt: str, out: str):
        return F.round(
            F.when(F.col("total") > 0, F.col(cnt) * 100.0 / F.col("total")).otherwise(
                0.0
            ),
            4,
        ).alias(out)

    return agg.select(
        "vendor",
        "cnt_lt60",
        "cnt_60_80",
        "cnt_80_100",
        "total",
        pct("cnt_lt60", "pct_lt60"),
        pct("cnt_60_80", "pct_60_80"),
        pct("cnt_80_100", "pct_80_100"),
    )
