"""TPC-H-shaped relational coverage beyond the reference surface.

The reference engine (SURVEY.md §2) stops at filter + equi-join +
conditional aggregation. A complete engine must also run the join /
subquery / outer-join shapes every warehouse workload uses; this module
implements the classic TPC-H query shapes the driver's synthetic star
schema can express (no partsupp table, no commit/receipt dates or
shipmode — those queries are adapted, noted per-query).

Scale notes (100 TB posture):
- Fixed-cardinality dimensions (region=5, nation=25, 1-row scalars)
  carry explicit broadcast hints; SF-scaled tables (supplier, part,
  customer) are left to AQE, which broadcasts them while small and
  falls back to shuffle joins when they outgrow the threshold — a
  forced hint on an SF-scaled frame is an executor OOM at 100 TB
  (asserted registry-wide in tests/test_scale_layout.py).
- Correlated subqueries (q17, q22) are expressed as aggregate-then-join
  so Catalyst plans one scan per input, no per-row re-execution.
- Disjunctive predicates (q19) stay inside one scan-filter; parquet
  row-group stats still prune via the OR-of-ANDs min/max envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

def _revenue():
    """Lazy so importing this module needs no active SparkContext."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (adapted: no commit/receipt dates, so
# "late" = any lineitem shipped more than 60 days after the order date)
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register(
    "q4_order_priority", oracle=_Q4_ORACLE, survey_ops="⊘exists,A8,P2", tier=0
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality → left-semi
    join with a post-join predicate. Orders is filtered to one half-year
    before the join; the semi-join dedups multi-lineitem orders without
    a distinct."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_nation_trade_volume", oracle=_Q7_ORACLE, survey_ops="J1,P2,A1,F12", tier=3
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join with a symmetric nation-pair filter.
    The (25-row-bounded) nation joins broadcast by hint; the nation
    filter is applied on the dimension side *before* the fact join so
    non-matching suppliers/customers never reach the shuffle. The
    supplier/customer joins themselves are AQE-decided (SF-scaled)."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = ["NATION_1", "NATION_2"]
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n1.filter(F.col("supp_nation").isin(pair))),
              F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n2.filter(F.col("cust_nation").isin(pair))),
              F.col("c_nationkey") == F.col("c_nk"))
        .select("c_custkey", "cust_nation")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n1.n_name AS supp_nation
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
"""


@register(
    "q8_market_share", oracle=_Q8_ORACLE, survey_ops="J1,P1,A1,A7,F12", tier=3
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way star join + conditional-aggregate ratio
    (one nation's share of regional volume per year). Region/nation
    hints force their (bounded) broadcasts; part/supplier/customer are
    AQE-decided so the plan degrades to shuffle joins instead of OOM
    when they outgrow the broadcast threshold at scale."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    asia_nations = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("c_nk"))
        .select("c_custkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    li = load(spark, sf_dir, "lineitem")
    vol = _revenue().alias("volume")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(F.year("o_orderdate").alias("o_year"), vol, "supp_nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no ps_supplycost; cost proxy is
# 50% of the part's retail price per unit)
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
FROM (
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           l_extendedprice * (1 - l_discount)
             - 0.5 * p_retailprice * l_quantity AS amount
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD'
) profit
GROUP BY nation, o_year
"""


@register(
    "q9_product_profit", oracle=_Q9_ORACLE, survey_ops="J1,A1,F6,F12", tier=3
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup by supplier nation x order year.
    partsupp doesn't exist in this schema, so unit cost is proxied as
    0.5 * p_retailprice (same join/agg shape, different constant)."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    amount = (
        _revenue() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).alias("amount")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("nation", F.year("o_orderdate").alias("o_year"), amount)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register(
    "q10_returned_items", oracle=_Q10_ORACLE, survey_ops="J1,P2,A1,W1,⊘limit", tier=3
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Returnflag filter reaches the lineitem scan (PushedFilters); the
    top-20 is TakeOrderedAndProject, not a global sort. Ties broken by
    c_custkey for a deterministic oracle compare."""
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority (adapted: no l_shipmode; classify by
# line status instead, counting high- vs low-priority orders)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register(
    "q12_priority_shipping", oracle=_Q12_ORACLE, survey_ops="J1,P6,A1,F12", tier=3
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-WHEN bucket counts (the same
    conditional-aggregation primitive as the reference's vendor
    histogram, A1, applied over a join)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register(
    "q13_order_count_distribution", oracle=_Q13_ORACLE, survey_ops="⊘outer-join,A8", tier=3
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers
    (c_count = 0), then a histogram of the counts — double aggregation.
    The join predicate includes a non-key condition, which must stay in
    the join (not a post-filter) to keep outer semantics."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register(
    "q14_promo_revenue_share", oracle=_Q14_ORACLE, survey_ops="J1,A1,A7,F12", tier=3
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage-of-total via conditional aggregation
    in a single pass (no second scan for the denominator)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0))
                / F.sum(_revenue()),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (revenue view + max)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register(
    "q15_top_supplier", oracle=_Q15_ORACLE, survey_ops="A2,J1,⊘scalar-subquery", tier=3
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar-subquery max, returning
    every tied supplier. The scalar subquery becomes a 1-row broadcast
    join against the per-supplier aggregate — no global window, so the
    tie filter stays parallel even with millions of suppliers."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    top = rev.join(
        F.broadcast(max_rev), rev.total_revenue == max_rev.max_revenue
    ).drop("max_revenue")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(supplier, "s_suppkey").select(
        "s_suppkey", "s_name", "total_revenue"
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (
      SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


@register(
    "q17_small_quantity_revenue", oracle=_Q17_ORACLE, survey_ops="⊘correlated-subquery,A1,J1", tier=3
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average. De-correlated into
    aggregate-then-join: one pass computes avg quantity per part, then
    a join (AQE broadcasts the per-part aggregate while it fits)
    filters lineitems below half their part's average — Catalyst's own
    decorrelation produces the same plan shape, written explicitly
    here so the aggregate side, not the fact table, is the build
    side."""
    li = load(spark, sf_dir, "lineitem")
    brand_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    # per-part avg over ALL lineitems (correlation is on partkey alone)
    part_avg = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(brand_parts, li.l_partkey == brand_parts.p_partkey)
        .join(part_avg.join(brand_parts,
                            part_avg.l_partkey == brand_parts.p_partkey)
              .select("l_partkey", "half_avg_qty"),
              on="l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue with disjunctive predicates
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q19_disjunctive_revenue", oracle=_Q19_ORACLE, survey_ops="P6,J1,A1,F12", tier=3
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    extracts the single-side envelopes (quantity 1-30 on lineitem,
    brand/size union on part) as pushed-down pre-filters, then applies
    the full disjunction after the (AQE-decided) part join."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: no phone column; "idle" =
# above-average balance and no orders since 2000 — every customer in
# the synthetic data has *some* order, so "no orders at all" would be
# vacuously empty)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH avg_bal AS (
    SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_nationkey AS INT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


@register(
    "q22_idle_customers", oracle=_Q22_ORACLE, survey_ops="⊘anti,⊘scalar-subquery,A1", tier=3
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average balance) +
    NOT EXISTS anti-join. The scalar is a 1-row broadcast cross join —
    no driver-side collect — and the anti-join build side is just the
    distinct order custkeys."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (argmin per group; adapted: supply cost is
# the cheapest observed unit price per (part, supplier) in lineitem,
# since the synthetic schema has no partsupp table)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           ROUND(MIN(l_extendedprice / l_quantity), 4) AS supply_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
), best AS (
    SELECT l_partkey, l_suppkey, supply_cost,
           ROW_NUMBER() OVER (
               PARTITION BY l_partkey ORDER BY supply_cost, l_suppkey
           ) AS rn
    FROM cost
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, s_name, supply_cost
FROM best
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE rn = 1 AND p_size < 10
"""


@register(
    "q2_min_cost_supplier", oracle=_Q2_ORACLE, survey_ops="⊘argmin,A2,J1", tier=3
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group (cheapest supplier per part).
    Spark-first: a single `min(struct(cost, suppkey))` aggregate picks
    the winner with a deterministic tie-break — no self-join against a
    per-group MIN and no window over the full fact table. The unit
    price is rounded before the argmin so Spark and the oracle order
    identical values."""
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "supply_cost"
        )
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min(F.struct("supply_cost", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            F.col("b.supply_cost").alias("supply_cost"),
            F.col("b.l_suppkey").alias("l_suppkey"),
        )
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") < 10)
        .select("p_partkey", "p_name")
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supplier, best.l_suppkey == supplier.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "supply_cost")
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (group aggregate vs a global-share threshold)
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH pv AS (
    SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS v
    FROM lineitem
    GROUP BY l_partkey
)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       ROUND(v, 2) AS part_value
FROM pv
WHERE v > (SELECT AVG(v) * 1.5 FROM pv)
"""


@register(
    "q11_important_parts", oracle=_Q11_ORACLE, survey_ops="⊘scalar-subquery,A1,A2", tier=3
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep groups whose aggregate exceeds a global
    statistic of the groups (1.5x the mean per-part value — scale
    invariant, unlike a fixed fraction of the total). The statistic is
    re-aggregated from the per-part frame (not a second fact scan) and
    broadcast as one row."""
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("v"))
    total = pv.agg((F.avg("v") * 1.5).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("threshold"))
        .select("l_partkey", F.round("v", 2).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part group (count-distinct + NOT IN)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size < 30
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_part_supplier_variety", oracle=_Q16_ORACLE, survey_ops="⊘distinct-agg,⊘anti,J1", tier=3
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (rewritten as an anti-join on the
    excluded-supplier set, AQE-broadcast while small) + COUNT(DISTINCT)
    grouped by part attributes. The anti-join runs before the part
    join so excluded rows never reach the wider plan."""
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_size") < 30))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — excess suppliers (nested IN-subqueries + scalar threshold)
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH sq AS (
    SELECT l_suppkey, SUM(l_quantity) AS qty
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
        SELECT l_suppkey FROM sq WHERE qty > (SELECT 0.5 * AVG(qty) FROM sq)
      )
  AND s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      )
"""


@register(
    "q20_excess_suppliers", oracle=_Q20_ORACLE, survey_ops="⊘semi,⊘scalar-subquery,J2", tier=3
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two nested IN-subqueries (qualifying shipment
    volume; nation membership) → two left-semi joins, with the volume
    threshold as a 1-row broadcast against the already-aggregated
    per-supplier frame."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    sq = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = sq.agg((0.5 * F.avg("qty")).alias("thr"))
    qualifying = (
        sq.crossJoin(F.broadcast(thr)).filter(F.col("qty") > F.col("thr")).select("l_suppkey")
    )
    nations = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("n_nationkey")
    )
    supplier = load(spark, sf_dir, "supplier")
    return (
        supplier.join(
            qualifying,
            supplier.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .join(
            F.broadcast(nations),
            supplier.s_nationkey == nations.n_nationkey,
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept waiting orders (EXISTS + NOT EXISTS; adapted:
# "late" = shipped more than 30 days after the order date)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s_name
"""


@register(
    "q21_blocking_suppliers", oracle=_Q21_ORACLE, survey_ops="⊘exists,⊘not-exists,A3", tier=0
)
def q21_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS over the same
    fact table. Spark-first: both existence tests collapse into one
    window pass over the order's lineitems — `collect_set(suppkey)`
    counts suppliers and late suppliers per order, so the fact table is
    shuffled once on orderkey instead of self-joined twice."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        )
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
