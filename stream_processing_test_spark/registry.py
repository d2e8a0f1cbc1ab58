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

# Round-11 rotation: the driver checks a 50-query prefix. Tier (0) =
# owed a fresh row THIS round — 23 queries: the SEVEN with no driver
# row at all (``doc_lm_score``, registered after r10's window froze,
# plus the six NEW r11 operators ``sequence_pack``,
# ``quality_calibrated_filter``, ``lang_sampling_weights``,
# ``doc_span_dedup``, ``class_balanced_sample``,
# ``streaming_enriched_rollup``), the TWO
# whose oracle/implementation changed in r11 (``ann_ivf_topk`` and
# ``ann_ivfpq_topk`` — the zero-norm training filter adds the
# ``ctrain`` CTE to their Lloyd oracle chain and the numpy keep-mask
# to the trainer, and ``_assign_arrow`` — ungated, the sole
# assignment pass since the r11 decision retired both expression
# forms — replaces their assignment stage), and the FOURTEEN r8-row
# deferrals the r10 plan bound r11 to lead with.
# Tier (1) = 27 of the 47 queries
# whose newest driver row is r9; 23 + 27 fills the window exactly.
#
# TWENTY r9-row queries are deferred to r12 — all unchanged-code
# shape twins of queries holding a FRESH (r10 or r11-window) row:
# ``ann_cosine_topk_int8`` (dequantized twin of r10-row
# ``ann_cosine_topk``), ``user_cardinality_approx`` (approx twin of
# in-window ``user_cardinality``), ``balance_quartiles`` (ntile twin
# of in-window ``user_value_percentiles``), ``doc_fingerprint``
# (map-pass twin of r10-row ``token_count``),
# ``multimodal_preprocess`` (mapInPandas codec twin of in-window
# ``multimodal_features``), ``embedding_quantize_int8`` (fold-pass
# twin of in-window ``embedding_norm_stats``), ``envelope_rollup`` +
# ``envelope_rollup_parquet`` + ``envelope_rollup_orc`` (format twins
# of in-window ``envelope_rollup_csv`` — same oracle),
# ``q4_order_priority`` (EXISTS twin of in-window
# ``q21_blocking_suppliers``), ``q20_excess_suppliers`` (semi-join
# twin of in-window ``q16_part_supplier_variety``),
# ``q22_idle_customers`` (anti-join twin of in-window
# ``q13_order_count_distribution``), ``rich_accounts_union`` (set-ops
# twin of in-window ``engaged_users_setops``),
# ``streaming_envelope_rollup`` + ``streaming_rate_rollup`` +
# ``streaming_session_windows`` + ``streaming_sliding_rollup``
# (micro-batch harness twins of r10-row ``streaming_daily_scores`` /
# ``streaming_daily_scores_update`` / ``streaming_dedup``),
# ``q7_nation_trade_volume`` + ``q8_market_share`` (multi-way
# broadcast-star twins of in-window ``q9_product_profit``/
# ``q10_returned_items`` — demoted when the late-registered
# ``doc_span_dedup`` and ``class_balanced_sample`` claimed their
# tier-0 slots), ``dedup_simhash`` (banded-fingerprint
# candidate/verify twin of in-window ``dedup_minhash_lsh`` — same
# bucket-join + verify stages over the same shingle base; demoted for
# ``streaming_enriched_rollup``'s slot). ALL TWENTY must head r12's
# window (plus anything r12 changes).
# Unlisted queries keep ``10 + tier``.
_ROTATION_TIERS: dict[str, int] = {
    # (0) never-checked, r11-new/changed, or the fourteen r8-row
    # deferrals documented below
    "doc_lm_score": 0,
    "doc_span_dedup": 0,
    "class_balanced_sample": 0,
    "streaming_enriched_rollup": 0,
    "sequence_pack": 0,
    "quality_calibrated_filter": 0,
    "lang_sampling_weights": 0,
    "ann_ivf_topk": 0,
    "ann_ivfpq_topk": 0,
    "resolution_classify": 0,
    "lang_id_ngram": 0,
    "doc_chunking": 0,
    "user_cardinality": 0,
    "engaged_users_setops": 0,
    "monotonic_violations": 0,
    "error_labels": 0,
    "dedup_embedding_cosine": 0,
    "envelope_rollup_csv": 0,
    "daily_scores": 0,
    "sql_daily_event_summary": 0,
    "report_batches": 0,
    "source_mixing": 0,
    "records_in_window": 0,
    # (1) newest driver row is r9
    "ann_lsh_topk": 1,
    "attribute_rollup": 1,
    "cohort_retention": 1,
    "decayed_user_scores": 1,
    "decontaminate_bloom": 1,
    "dedup_embedding_lsh": 1,
    "dedup_minhash_lsh": 1,
    "dedup_ngram_jaccard": 1,
    "dup_clusters": 1,
    "dup_clusters_star": 1,
    "funnel_conversion": 1,
    "multimodal_features": 1,
    "price_percentiles": 1,
    "q10_returned_items": 1,
    "q13_order_count_distribution": 1,
    "q16_part_supplier_variety": 1,
    "q18_large_orders": 1,
    "q1_pricing_summary": 1,
    "q21_blocking_suppliers": 1,
    "q2_min_cost_supplier": 1,
    "q6_forecast_revenue": 1,
    "q9_product_profit": 1,
    "revenue_cube": 1,
    "skew_salted_rollup": 1,
    "stats_moments": 1,
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
