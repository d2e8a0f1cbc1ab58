"""Statistical & multi-dimensional aggregation coverage.

The reference's aggregate surface (SURVEY.md §2.4) is conditional
counts, max-having, and ratio post-aggregates; §2.4⊘ notes the absence
of grouping sets / cube and distinct aggregates. This module supplies
the statistical-warehouse layer a complete engine needs: moments
(stddev/variance), bivariate statistics (corr/covar), exact
interpolated percentiles, CUBE with grouping_id, and UNION ALL
cross-table composition.

Scale notes (100 TB posture):
- Every aggregate here is algebraic or sketchable: moments and
  covariances partial-aggregate map-side (Spark's ImperativeAggregate
  merge), so the shuffle carries one small state row per group, not
  raw rows.
- Exact percentiles are the one holdout (they buffer per-group
  values); at 100 TB swap `percentile` for `percentile_approx`
  (t-digest, mergeable) — kept exact here so the DuckDB oracle can
  verify values bit-for-bit after rounding.
- CUBE multiplies output rows (4x for two dims), not input rows; the
  expansion happens post-aggregation in Spark's Expand node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

# ---------------------------------------------------------------------------
# Moments + bivariate statistics per group
# ---------------------------------------------------------------------------

_STATS_ORACLE = """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_stddev,
       ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
       ROUND(AVG(l_extendedprice), 2) AS price_avg,
       ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
"""


@register("stats_moments", oracle=_STATS_ORACLE, survey_ops="⊘stats-agg(§2.4)")
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / variance / correlation / covariance per return
    flag. All five are algebraic aggregates (mergeable partial states),
    so the plan is a single scan + one small shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.avg("l_extendedprice"), 2).alias("price_avg"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles per group
# ---------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 2) AS price_p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 2) AS price_p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 2) AS price_p75
FROM lineitem
GROUP BY l_returnflag
"""


@register("price_percentiles", oracle=_PCTL_ORACLE, survey_ops="⊘percentile(§2.4)")
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quartiles of extended price per return
    flag (Spark `percentile` == DuckDB `quantile_cont`). See module
    docstring: at 100 TB this becomes `percentile_approx`."""
    li = load(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 2).alias("price_p25"),
            F.round(F.col("p")[1], 2).alias("price_p50"),
            F.round(F.col("p")[2], 2).alias("price_p75"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE + grouping_id
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
           AS gid,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("revenue_cube", oracle=_CUBE_ORACLE, survey_ops="⊘cube(§2.4)")
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with an explicit grouping id
    (Spark's grouping_id bit order — first cube column is the high
    bit — matches GROUPING(a)*2+GROUPING(b)). Subtotal keys are
    COALESCEd to 'ALL' in both engines so the value hash is stable."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "revenue",
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# UNION ALL composition across tables
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_accounts,
       CAST(COUNT(DISTINCT nationkey) AS BIGINT) AS n_nations,
       ROUND(SUM(acctbal), 2) AS total_balance
FROM (
    SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal
    FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT 'supplier' AS kind, s_nationkey AS nationkey, s_acctbal AS acctbal
    FROM supplier WHERE s_acctbal > 5000
) accounts
GROUP BY kind
"""


@register("rich_accounts_union", oracle=_UNION_ORACLE, survey_ops="⊘union(§2.6),⊘distinct-agg")
def rich_accounts_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-shaped tables projected onto a
    common schema, then grouped. Each branch's filter pushes down into
    its own parquet scan before the union."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.lit("customer").alias("kind"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(
            F.lit("supplier").alias("kind"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    return (
        cust.unionByName(supp)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_accounts"),
            F.count_distinct("nationkey").alias("n_nations"),
            F.round(F.sum("acctbal"), 2).alias("total_balance"),
        )
    )


# ---------------------------------------------------------------------------
# ntile / percent_rank window ranking
# ---------------------------------------------------------------------------

_QUARTILE_ORACLE = """
WITH ranked AS (
    SELECT c_nationkey, c_acctbal,
           NTILE(4) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) AS quartile
    FROM customer
)
SELECT CAST(c_nationkey AS INT) AS c_nationkey,
       CAST(quartile AS INT) AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 2)
           AS total_balance
FROM ranked
GROUP BY c_nationkey, quartile
"""


@register("balance_quartiles", oracle=_QUARTILE_ORACLE, survey_ops="⊘ntile(§2.5)")
def balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) within each nation, then per-quartile balance summary.
    The window partitions by nation (parallel, no global sort) and
    orders by (balance, custkey) so tied balances land in the same
    quartile in both engines. The balance total is summed in exact
    integer cents: a float SUM's value depends on partition merge
    order, and a mean can land exactly on a half-cent where engines
    break the rounding tie differently — an integer-cent sum has
    neither problem."""
    from pyspark.sql.window import Window

    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    return (
        cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_balance"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (arbitrary set list — not the full cube lattice)
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)), 0) AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("quantity_grouping_sets", oracle=_GSETS_ORACLE, survey_ops="⊘grouping-sets(§2.4)")
def quantity_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with an explicit set list — the (flag, status),
    (flag), () rollup lattice WITHOUT the (status)-only member a CUBE
    would add. Expressed as SQL text (the DataFrame API has no
    grouping-sets builder; rollup/cube are its only lattice sugar).
    Quantities are integral doubles, summed as longs for exactness."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS DOUBLE)
                   AS total_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# Skew-salted aggregation, exercised end-to-end (functions.skew)
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_error
FROM events
GROUP BY user_id
"""


@register(
    "skew_salted_rollup",
    oracle=_SKEW_ORACLE,
    survey_ops="A3,A8,§7-skew",
    tier=2,
)
def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A3-shaped per-source rollup routed through the two-phase
    SALTED aggregation (functions.skew.salted_aggregate): partials on
    (user_id, salt), finals on user_id. The salt spreads a hot key
    over n_salts reducers, so one mega-source cannot pin a stage on a
    single task at 100 TB. The final result is salt-invariant —
    count/sum partials re-combine exactly — which is what the plain
    GROUP BY oracle verifies end-to-end (value sums rounded to 4, the
    repo's cross-engine float convention)."""
    from stream_processing_test_spark.functions.skew import salted_aggregate

    ev = load(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["user_id"],
        partial_aggs=[
            F.count("*").alias("c"),
            F.sum("value").alias("s"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("e"),
        ],
        final_aggs=[
            F.sum("c").alias("n_events"),
            F.round(F.sum("s"), 4).alias("total_value"),
            F.sum("e").alias("n_error"),
        ],
    )
