"""General relational benchmark queries (TPC-H-shaped) over the driver's
synthetic star schema.

The reference engine's relational surface (SURVEY.md §2.2-2.5) is
filter + equi-join + conditional aggregation; these queries exercise the
same primitives at bench scale (sf0.1, ~600k lineitem) plus the sort /
limit / multi-join shapes the reference lacks (marked ⊘ in the survey —
implemented here because a complete engine needs them).

Scale notes:
- q1: single shuffle on a 6-value grouping key; partial aggregation
  happens map-side (Catalyst HashAggregate partial/final) so the shuffle
  carries 6 rows per task regardless of input size.
- q3: join order customer→orders→lineitem; customer is broadcast
  (dimension ~1.5% the size of lineitem); the orders⋈lineitem join
  shuffles on o_orderkey/l_orderkey. Top-10 via TakeOrderedAndProject —
  no global sort materialization.
- q5-shaped join chain: all small dims broadcast; one fact shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, survey_ops="P2,P5,A1,A8,F5,F6")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, survey_ops="J1,P1,P2,A1,W1,⊘limit")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim join + fact join + top-k.

    Deterministic top-10: ties broken by l_orderkey. Revenue is rounded
    in BOTH engines before use so float noise cannot reorder the sort.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_region_revenue", oracle=_Q5_ORACLE, survey_ops="J1,P1,P2,A1,F12")
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — every dimension broadcast, one fact
    pass, single aggregate shuffle on a low-cardinality key."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    dims = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    ).select("s_suppkey", "n_name")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), lineitem.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_SETOPS_ORACLE = """
SELECT CAST(user_id AS BIGINT) AS user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 100
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 100
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 300
) t
"""


@register("engaged_users_setops", oracle=_SETOPS_ORACLE, survey_ops="⊘setops(§2.6)")
def engaged_users_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (absent in the reference, §2.6 ⊘): INTERSECT /
    EXCEPT distinct semantics. Catalyst rewrites both into joins —
    left-semi for INTERSECT, left-anti for EXCEPT — on pre-aggregated
    (distinct) inputs, so cost is bounded by distinct user count."""
    ev = load(spark, sf_dir, "events")
    purchasers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    ).select("user_id")
    clickers = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 100)
    ).select("user_id")
    bad = ev.filter((F.col("event_type") == "error") & (F.col("value") > 300)).select(
        "user_id"
    )
    return purchasers.intersect(clickers).subtract(bad)
