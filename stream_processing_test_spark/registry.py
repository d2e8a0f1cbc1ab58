"""Query registry: the bridge between operator modules and the driver
contract (``__spark_entry__.py``).

Every implemented operator registers a named query — a pure
``(spark, sf_dir) -> DataFrame`` callable — and, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string computing the same
result over the same parquet tables. The driver compares the two
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically in both;
- float aggregates are rounded to a fixed precision in both;
- timestamps crossing the boundary are formatted as strings in both
  (parquet ns-timestamps read differently in Spark vs DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    survey_ops: str  # SURVEY.md §2 operator ids this query exercises
    tier: int = 1  # driver-check priority: lower enumerates first


_REGISTRY: dict[str, QuerySpec] = {}

# Round-3 rotation (VERDICT r2 items 1+2): the driver checks a
# 50-query prefix, so put (0) queries whose behavior or oracle changed
# this round — the LSH family gained portable md5-derived oracles,
# dup_clusters gained in-job convergence, the prober gained
# cancellation, the streak op lost its global-conf write — and
# (1) every query the r2 run didn't reach (TPC-H suite, vendor/error/
# resolution, stats/sqltext/setops) inside the window. Unlisted
# queries keep ``10 + tier`` and fill the remaining ~12 slots in
# registration order — all of them have green r2 rows already.
# The two multimodal stubs are pushed last: their rows-only check is
# unchanged since r2 and shouldn't burn window slots.
_ROTATION_TIERS: dict[str, int] = {
    # (0) changed / newly-oracled this round
    "dedup_minhash_lsh": 0,
    "dedup_simhash": 0,
    "dedup_embedding_lsh": 0,
    "ann_lsh_topk": 0,
    "ann_ivf_topk": 0,
    "dup_clusters": 0,
    "probe_source_events": 0,
    "streaming_failure_streaks": 0,
    "dedup_keep_canonical": 0,
    "decontaminate_overlap": 0,
    "corpus_curation_pipeline": 0,
    "doc_repetition_stats": 0,
    "pii_redact": 0,
    "substring_dup_coverage": 0,
    "embedding_kmeans_clusters": 0,
    # (1) not enumerated by the r2 driver run
    "error_labels": 1,
    "resolution_classify": 1,
    "sql_daily_event_summary": 1,
    "stats_moments": 1,
    "price_percentiles": 1,
    "revenue_cube": 1,
    "rich_accounts_union": 1,
    "balance_quartiles": 1,
    "quantity_grouping_sets": 1,
    "vendor_flow_stats": 1,
    "q1_pricing_summary": 1,
    "q2_min_cost_supplier": 1,
    "q3_shipping_priority": 1,
    "q5_region_revenue": 1,
    "q6_forecast_revenue": 1,
    "q7_nation_trade_volume": 1,
    "q8_market_share": 1,
    "q9_product_profit": 1,
    "q10_returned_items": 1,
    "q11_important_parts": 1,
    "q12_priority_shipping": 1,
    "q13_order_count_distribution": 1,
    "q14_promo_revenue_share": 1,
    "q15_top_supplier": 1,
    "q16_part_supplier_variety": 1,
    "q17_small_quantity_revenue": 1,
    "q18_large_orders": 1,
    "q19_disjunctive_revenue": 1,
    "q20_excess_suppliers": 1,
    "q22_idle_customers": 1,
    # unchanged rows-only stubs: last
    "multimodal_features": 99,
    "multimodal_preprocess": 99,
}


def register(
    name: str,
    oracle: str | None = None,
    survey_ops: str = "",
    tier: int = 1,
):
    """Decorator: register ``fn`` as a named query with optional oracle.

    ``tier`` orders driver-side enumeration (``all_queries`` sorts by
    it, stable within a tier). The driver's correctness gate checks
    only a 50-query prefix of the registry, so ordering decides which
    queries get a fresh driver row each round. Registered tiers:
    tier=0 for queries new/changed in the round that introduced them,
    tier=1 for the stable core, tier=3 for the long-stable TPC-H
    suite. Per-round rotation is applied on top via
    ``_ROTATION_TIERS`` (see ``all_queries``), so call-site tiers
    don't need edits every round."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey_ops=survey_ops, tier=tier
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    # Imports are deferred so `import stream_processing_test_spark` stays
    # cheap and circular imports are impossible.
    from stream_processing_test_spark.operators import (  # noqa: F401
        extended,
        programs,
        relational,
        rollup,
        sqltext,
        stats,
        tpch,
        vendor,
        windows,
    )
    from stream_processing_test_spark.sources import probe  # noqa: F401
    from stream_processing_test_spark.llm import (  # noqa: F401
        cluster,
        corpus,
        dedup,
        embeddings,
        filters,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from stream_processing_test_spark.streaming import (  # noqa: F401
        joins,
        pipeline,
        stateful,
    )

    return {
        spec.name: spec
        for spec in sorted(
            _REGISTRY.values(),
            key=lambda s: _ROTATION_TIERS.get(s.name, 10 + s.tier),
        )  # stable: insertion order within a tier
    }
