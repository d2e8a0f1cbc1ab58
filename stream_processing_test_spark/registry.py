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

# Round-9 rotation (VERDICT r8 item 2): the driver checks a 50-query
# prefix. Tier (0) = owed a fresh row THIS round — 14 queries: the two
# r6-row deferrals from r8 (``user_cardinality_approx``,
# ``doc_fingerprint``), ``streaming_rate_rollup`` (registered r8,
# never driver-gated — ADVICE r8 #1), the NEW
# ``envelope_rollup_parquet``/``envelope_rollup_orc`` (VERDICT r8
# missing #2), the six NEW r9 operators
# (``embedding_quantize_int8``, ``ann_cosine_topk_int8``,
# ``decontaminate_bloom``, ``streaming_sliding_rollup``,
# ``ann_pq_topk``, ``bm25_topk``), and the three queries whose implementation
# changed in r9:
# ``dedup_embedding_lsh`` + ``ann_lsh_topk`` (auto_tables hold-recall
# policy, dynamic-tables oracle) and ``ann_ivf_topk`` (sampled
# driver-local training, train-gate oracle). Tier (1) = 36 of the 47
# queries whose newest driver row is r7; 14 + 36 fills the 50-slot
# window exactly. The ELEVEN r7-row queries deferred to r10 are
# unchanged-code shape twins whose physical shape holds a FRESH row.
# The first seven, deferred when the r8-planned window was drawn:
# ``quantity_grouping_sets`` (rollup machinery twin of in-window
# ``revenue_cube``), ``q14_promo_revenue_share`` (join+CASE-ratio twin
# of in-window ``q9_product_profit``), ``q19_disjunctive_revenue``
# (pushed-predicate-scan twin of r8-row ``q6_forecast_revenue``),
# ``pii_redact`` (regexp map-pass twin of r8-row ``lang_id_ngram``),
# ``doc_repetition_stats`` (explode→keyed-agg twin of r8-row
# ``tfidf_top_terms``), ``q11_important_parts`` (scalar-subquery
# share-filter twin of in-window ``q16_part_supplier_variety``), and
# ``q12_priority_shipping`` (lineitem join + conditional-agg twin of
# in-window ``q10_returned_items``) — their slots went to the NEW
# ``embedding_quantize_int8`` and ``ann_cosine_topk_int8``.
# Four more were deferred when the NEW ``decontaminate_bloom``,
# ``streaming_sliding_rollup``, ``ann_pq_topk`` and ``bm25_topk`` took
# tier-0 slots late in r9:
# ``q3_shipping_priority`` (customer⋈orders⋈lineitem agg+topN twin of
# in-window ``q10_returned_items``), ``q5_region_revenue``
# (region/nation-dim join twin of in-window ``q8_market_share``) and
# ``q15_top_supplier`` (scalar-subquery-max twin of in-window
# ``q2_min_cost_supplier``), and ``q17_small_quantity_revenue``
# (correlated per-key-threshold twin of in-window
# ``q18_large_orders``). All ELEVEN deferrals MUST head r10's window.
# Unlisted queries keep ``10 + tier``.
_ROTATION_TIERS: dict[str, int] = {
    # (0) new, never-gated, r8-deferred, or implementation-changed in r9
    "user_cardinality_approx": 0,
    "doc_fingerprint": 0,
    "streaming_rate_rollup": 0,
    "envelope_rollup_parquet": 0,
    "envelope_rollup_orc": 0,
    "embedding_quantize_int8": 0,
    "ann_cosine_topk_int8": 0,
    "dedup_embedding_lsh": 0,
    "ann_lsh_topk": 0,
    "ann_ivf_topk": 0,
    "decontaminate_bloom": 0,
    "streaming_sliding_rollup": 0,
    "ann_pq_topk": 0,
    "bm25_topk": 0,
    # (1) newest driver row is r7
    "attribute_rollup": 1,
    "balance_quartiles": 1,
    "cohort_retention": 1,
    "decayed_user_scores": 1,
    "dedup_minhash_lsh": 1,
    "dedup_ngram_jaccard": 1,
    "dedup_simhash": 1,
    "dup_clusters": 1,
    "dup_clusters_star": 1,
    "envelope_rollup": 1,
    "funnel_conversion": 1,
    "multimodal_features": 1,
    "multimodal_preprocess": 1,
    "price_percentiles": 1,
    "q10_returned_items": 1,
    "q13_order_count_distribution": 1,
    "q16_part_supplier_variety": 1,
    "q18_large_orders": 1,
    "q1_pricing_summary": 1,
    "q20_excess_suppliers": 1,
    "q21_blocking_suppliers": 1,
    "q22_idle_customers": 1,
    "q2_min_cost_supplier": 1,
    "q4_order_priority": 1,
    "q6_forecast_revenue": 1,
    "q7_nation_trade_volume": 1,
    "q8_market_share": 1,
    "q9_product_profit": 1,
    "revenue_cube": 1,
    "rich_accounts_union": 1,
    "skew_salted_rollup": 1,
    "stats_moments": 1,
    "streaming_envelope_rollup": 1,
    "streaming_session_windows": 1,
    "user_value_percentiles": 1,
    "vendor_flow_stats": 1,
}


def register(
    name: str,
    oracle: str | None = None,
    survey_ops: str = "",
    tier: int = 1,
):
    """Decorator: register ``fn`` as a named query with optional oracle.

    ``tier`` is the query's *registration-time* priority, frozen at the
    round that introduced it (0 = was new then, 1 = core, 3 = the
    TPC-H suite) — it is NOT kept current round-to-round. Enumeration
    order is decided by ``_ROTATION_TIERS`` (edited each round); a
    query absent from the rotation falls back to ``10 + tier``, so the
    frozen call-site value only breaks ties among unrotated queries.
    The driver's correctness gate checks a 50-query prefix of that
    order, so the rotation decides which queries get a fresh driver
    row each round."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey_ops=survey_ops, tier=tier
        )
        return fn

    return deco


# Queries whose fn() runs its heavy plan internally (streaming sinks,
# iterative convergence loops behind localCheckpoint): the returned
# frame's lineage is cut, so plan inspection sees only a memory/RDD
# scan — AND merely building the frame executes the whole query. Plan
# tooling (tools/audit_plans.py) and the broadcast sweep test skip
# these by name; their physical shape is asserted piecewise in
# tests/test_scale_layout.py instead.
PLAN_OPAQUE_QUERIES: dict[str, str] = {
    "ann_ivf_topk": "iterative k-means materialized in fn()",
    "ann_lsh_topk": "bucketed index materialized in fn()",
    "decontaminate_overlap": "inverted index materialized in fn()",
    "dedup_embedding_lsh": "bucket+verify materialized in fn()",
    "dedup_minhash_lsh": "signatures/banding materialized in fn()",
    "dedup_ngram_jaccard": "shingle index materialized in fn()",
    "dedup_simhash": "fingerprints materialized in fn()",
    "dup_clusters": "connected-components loop materialized in fn()",
    "dup_clusters_star": "star-contraction loop materialized in fn()",
    "leakage_safe_split": "connected-components loop materialized in fn()",
    "streaming_click_purchase_join": "streaming sink",
    "streaming_daily_scores": "streaming sink",
    "streaming_dedup": "streaming sink",
    "streaming_envelope_rollup": "streaming sink",
    "streaming_failure_streaks": "streaming sink",
    "streaming_rate_rollup": "streaming sink",
    "streaming_session_windows": "streaming sink",
    "streaming_sliding_rollup": "streaming sink",
}


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    # Imports are deferred so `import stream_processing_test_spark` stays
    # cheap and circular imports are impossible.
    from stream_processing_test_spark.operators import (  # noqa: F401
        behavior,
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
    from stream_processing_test_spark.sources import envelope, probe  # noqa: F401
    from stream_processing_test_spark.llm import (  # noqa: F401
        cluster,
        corpus,
        dedup,
        embeddings,
        filters,
        multimodal,
        pq,
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
