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
- q5-shaped join chain: fixed dims (nation/region) broadcast by hint,
  SF-scaled sides AQE-decided; one fact shuffle.
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


@register(
    "q1_pricing_summary", oracle=_Q1_ORACLE, survey_ops="P2,P5,A1,A8,F5,F6", tier=3
)
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


@register(
    "q3_shipping_priority", oracle=_Q3_ORACLE, survey_ops="J1,P1,P2,A1,W1,⊘limit", tier=3
)
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
        .join(customer, orders.o_custkey == customer.c_custkey, "inner")
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


@register(
    "q5_region_revenue", oracle=_Q5_ORACLE, survey_ops="J1,P1,P2,A1,F12", tier=3
)
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
        .join(dims, lineitem.l_suppkey == dims.s_suppkey)
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


_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q6_forecast_revenue", oracle=_Q6_ORACLE, survey_ops="P2,P5,A1,F6", tier=3
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown
    benchmark — every predicate reaches the parquet scan
    (PushedFilters), the read schema is 3 columns, and the plan is a
    single partial/final aggregate with no join and no wide shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


_Q18_ORACLE = """
SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@register(
    "q18_large_orders", oracle=_Q18_ORACLE, survey_ops="J1,J2,A2,W1,⊘limit", tier=3
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery semi-join + 3-way join + top-k.
    The big-order key set is aggregated once and semi-joined
    (broadcast — it is tiny after HAVING); lineitem shuffles once on
    orderkey for the final quantity rollup."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_ANTI_ORACLE = """
SELECT CAST(DISTINCT_USERS.user_id AS BIGINT) AS user_id
FROM (SELECT DISTINCT user_id FROM events) DISTINCT_USERS
WHERE DISTINCT_USERS.user_id NOT IN (
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
)
"""


@register("users_without_big_purchase", oracle=_ANTI_ORACLE, survey_ops="⊘anti(§2.3)")
def users_without_big_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (absent in the reference): active users with no
    purchase above 200. ``left_anti`` — Catalyst's NOT IN rewrite —
    probes the (pre-filtered, broadcastable) build side once; no row
    multiplication, output bounded by the left side."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    big_buyers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).select("user_id")
    return users.join(big_buyers, "user_id", "left_anti")


_EXISTS_ORACLE = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
)
"""


@register("suppliers_with_bulk_items", oracle=_EXISTS_ORACLE, survey_ops="⊘exists(§2.3)")
def suppliers_with_bulk_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS correlated subquery → left-semi join. The fact side is
    pre-filtered (quantity > 49) before the semi-join so the probe set
    is small; at scale this is a broadcast semi-join."""
    supplier = load(spark, sf_dir, "supplier")
    bulk = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return supplier.join(bulk, "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name"
    )


_CARD_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


@register("user_cardinality", oracle=_CARD_ORACLE, survey_ops="⊘distinct-agg(§2.4)")
def user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent in the reference): exact distinct
    users per event type. Planned as a two-phase aggregate (expand on
    the distinct key, then count) — still one logical pass.

    The approximate path for 100 TB — ``approx_count_distinct`` (HLL,
    fixed memory per group, no expand) — is exercised in
    ``user_cardinality_approx`` (oracle-checked via a bounded-error
    claim, since raw HLL estimates are engine-specific)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )


_CARD_APPROX_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
"""


@register(
    "user_cardinality_approx",
    oracle=_CARD_APPROX_ORACLE,
    survey_ops="⊘approx-distinct(§2.4)", tier=0
)
def user_cardinality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimate (rsd=2%) next to the exact count —
    the sketch every 100 TB cardinality rollup actually uses (fixed
    ~1.5 KB of state per group vs an expand shuffle).

    HLL estimates are engine-specific by construction, so the raw
    estimate cannot hash-match a DuckDB twin. The query instead emits
    the deterministic CLAIM the sketch makes — "the estimate is within
    ±5% of the exact count" (2.5x the configured rsd) — as a boolean
    per group alongside the exact count; the oracle computes the exact
    count and literal TRUE. A wildly-off HLL therefore fails the hash
    compare rather than hiding behind a rows-only check."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.approx_count_distinct("user_id", rsd=0.02)
            .cast("double")
            .between(
                F.countDistinct("user_id") * 0.95,
                F.countDistinct("user_id") * 1.05,
            )
        ).alias("approx_within_5pct"),
    )
