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

# Round-14 rotation: the driver checks a 50-query prefix. The owed
# list is COMPUTED, not hand-maintained: ``python tools/gen_rotation.py
# [--changed ...]`` reads every CORRECTNESS_r*.json, finds the
# stale-minimum cohort (queries whose newest driver row is oldest —
# they MUST lead the window), and ranks the fill cohort by prior-row
# age. This dict is its r14 output, plus the round's new/changed
# queries (kept current as the round progresses, per the rotation
# contract). Unlisted queries keep ``10 + tier``.
#
# Tier (0) = the TWENTY-EIGHT r11-row deferrals the r13 verdict bound
# r14 to lead with (tool-verified), plus this round's changed queries
# annotated inline below. Tier (1) = the fill rows, gen_rotation's
# prior-row-age order — trimmed from 22 as changed queries entered
# tier 0, dropping the last-ranked fill rows each time.
_ROTATION_TIERS: dict[str, int] = {
    # (0) the twenty-eight r11-row deferrals (tools/gen_rotation.py)
    "ann_lsh_topk": 0,
    "attribute_rollup": 0,
    "cohort_retention": 0,
    "decayed_user_scores": 0,
    "decontaminate_bloom": 0,
    "dedup_embedding_lsh": 0,
    "dedup_ngram_jaccard": 0,
    "dup_clusters": 0,
    "dup_clusters_star": 0,
    "funnel_conversion": 0,
    "multimodal_features": 0,
    "price_percentiles": 0,
    "q10_returned_items": 0,
    "q13_order_count_distribution": 0,
    "q16_part_supplier_variety": 0,
    "q18_large_orders": 0,
    "q1_pricing_summary": 0,
    "q21_blocking_suppliers": 0,
    "q2_min_cost_supplier": 0,
    "q6_forecast_revenue": 0,
    "q9_product_profit": 0,
    "revenue_cube": 0,
    "skew_salted_rollup": 0,
    "sql_daily_event_summary": 0,
    "stats_moments": 0,
    "user_cardinality": 0,
    "user_value_percentiles": 0,
    "vendor_flow_stats": 0,
    # (0) r14 changed — kept current as the round progresses.
    # ann_ivfpq_topk changed (hash-agg codegen fallback fix, VERDICT
    # r13 item 2; ann_lsh_topk shares the fix and is already owed).
    # ann_ivf_topk + ann_auto_topk changed (the measured auto_probe
    # escalation policy, VERDICT r13 item 3). ann_index_append changed
    # (large-batch ADC dispatch, item 4). decontaminate_embedding
    # changed (explicit eval-side broadcast, item 5).
    # streaming_click_purchase_outer + streaming_session_windows
    # changed (shared sentinel-replay helper, item 7;
    # streaming_session_windows promoted out of the fill cohort).
    # Ten promotions/new (incl. ann_ivf_auto_probe, ann_pq_topk and
    # embedding_diverse_sample below) -> fill trimmed 22 -> 12,
    # dropping the last-ranked rows (q4_order_priority,
    # q7_nation_trade_volume, q8_market_share, rich_accounts_union,
    # streaming_envelope_rollup, streaming_rate_rollup,
    # q22_idle_customers, q20_excess_suppliers,
    # multimodal_preprocess).
    "ann_ivfpq_topk": 0,
    "ann_ivf_topk": 0,
    "ann_auto_topk": 0,
    "ann_index_append": 0,
    "decontaminate_embedding": 0,
    "streaming_click_purchase_outer": 0,
    "streaming_session_windows": 0,
    # ann_ivf_auto_probe NEW r14 (the measured auto_probe hold-recall
    # dial, VERDICT r13 item 3); q22_idle_customers (last-ranked fill)
    # waits for r15 to hold the window at 50
    "ann_ivf_auto_probe": 0,
    # ann_pq_topk changed r14 (wide-gather ADC + the Arrow encode
    # kernel ride its registered path too); q20_excess_suppliers
    # (last-ranked fill) waits for r15
    "ann_pq_topk": 0,
    # embedding_diverse_sample NEW r14 (cluster-stratified diverse
    # subset selection); multimodal_preprocess (last-ranked fill)
    # waits for r15 — tier-0 now matches gen_rotation --changed
    # exactly (28 owed + 10 new/changed = 38)
    "embedding_diverse_sample": 0,
    # (1) fill to 50, ranked by prior-row age (gen_rotation.py)
    "dedup_incremental": 1,
    "dedup_multimodal": 1,
    "lang_mismatch_audit": 1,
    "vocab_top_ngrams": 1,
    "ann_cosine_topk_int8": 1,
    "balance_quartiles": 1,
    "dedup_simhash": 1,
    "doc_fingerprint": 1,
    "embedding_quantize_int8": 1,
    "envelope_rollup": 1,
    "envelope_rollup_orc": 1,
    "envelope_rollup_parquet": 1,
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
    "ann_index_append": "iterative k-means (base split) materialized in fn()",
    "ann_ivf_auto_probe": "iterative k-means materialized in fn()",
    "ann_ivf_topk": "iterative k-means materialized in fn()",
    "ann_lsh_topk": "bucketed index materialized in fn()",
    "decontaminate_overlap": "inverted index materialized in fn()",
    "decontaminate_embedding": "signature tables materialized in fn()",
    "dedup_embedding_lsh": "bucket+verify materialized in fn()",
    "dedup_incremental": "shared signature relation materialized in fn()",
    "dedup_minhash_lsh": "signatures/banding materialized in fn()",
    "dedup_ngram_jaccard": "shingle index materialized in fn()",
    "dedup_multimodal": "fingerprints materialized in fn()",
    "doc_lm_score": "persisted pair_tf materialized in fn() (r12 scan cut)",
    "dedup_simhash": "fingerprints materialized in fn()",
    "embedding_diverse_sample": "iterative k-means materialized in fn()",
    "dup_clusters": "connected-components loop materialized in fn()",
    "dup_clusters_star": "star-contraction loop materialized in fn()",
    "leakage_safe_split": "connected-components loop materialized in fn()",
    "streaming_click_purchase_join": "streaming sink",
    "streaming_click_purchase_outer": "streaming sink",
    "streaming_daily_scores": "streaming sink",
    "streaming_daily_scores_update": "streaming sink",
    "streaming_dedup": "streaming sink",
    "streaming_enriched_rollup": "streaming sink",
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
        packing,
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
