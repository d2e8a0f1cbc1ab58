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

# Round-15 rotation: the driver checks a 50-query prefix. The owed
# list is COMPUTED, not hand-maintained: ``python tools/gen_rotation.py
# [--changed ...]`` reads every CORRECTNESS_r*.json, finds the
# stale-minimum cohort (queries whose newest driver row is oldest —
# they MUST lead the window), and ranks the fill cohort by prior-row
# age. This dict is its r15 output, plus the round's new/changed
# queries (kept current as the round progresses, per the rotation
# contract). Unlisted queries keep ``10 + tier``.
#
# Tier (0) = the THIRTY-FOUR r12-row deferrals the r14 verdict bound
# r15 to lead with (tool-verified), plus this round's changed queries
# annotated inline below. Tier (1) = the fill rows, gen_rotation's
# prior-row-age order — trimmed from 16 as changed queries enter
# tier 0, dropping the last-ranked fill rows each time.
_ROTATION_TIERS: dict[str, int] = {
    # (0) the thirty-four r12-row deferrals (tools/gen_rotation.py)
    "asof_click_attribution": 0,
    "bm25_multi_topk": 0,
    "corpus_curation_pipeline": 0,
    "day_close_trigger": 0,
    "dedup_minhash_lsh": 0,
    "doc_lm_score": 0,
    "doc_span_dedup": 0,
    "failing_programs": 0,
    "lang_id_ngram": 0,
    "multimodal_preprocess": 0,
    "per_source_rollup": 0,
    "probe_source_events": 0,
    "program_match": 0,
    "props_json_stats": 0,
    "q11_important_parts": 0,
    "q14_promo_revenue_share": 0,
    "q15_top_supplier": 0,
    "q19_disjunctive_revenue": 0,
    "q20_excess_suppliers": 0,
    "q22_idle_customers": 0,
    "q4_order_priority": 0,
    "q5_region_revenue": 0,
    "q7_nation_trade_volume": 0,
    "q8_market_share": 0,
    "quantity_grouping_sets": 0,
    "revenue_rollup": 0,
    "rich_accounts_union": 0,
    "rolling_user_stats": 0,
    "streaming_click_purchase_join": 0,
    "streaming_envelope_rollup": 0,
    "streaming_failure_streaks": 0,
    "streaming_rate_rollup": 0,
    "streaming_sliding_rollup": 0,
    "user_cardinality_approx": 0,
    # (0) r15 NEW: embedding_top_component (power-iteration PCA,
    # projection extremes); embedding_norm_stats (last-ranked fill)
    # waits for r16 to hold the window at 50
    "embedding_top_component": 0,
    # (0) r15 NEW: mmr_diverse_topk (greedy MMR diversity re-rank,
    # §2.9 applyInPandas surface); embedding_centroids (last-ranked
    # fill) waits for r16
    "mmr_diverse_topk": 0,
    # (0) r15 NEW: embedding_knn_graph (per-node LSH k-NN graph), plus
    # dedup_embedding_lsh promoted as CHANGED — both transit the
    # embedding_lsh_pairs core, whose tail gained the per_node_top_k
    # branch (threshold path value-identical, but the code moved).
    # Fill trimmed 11 -> 9: doc_quality_score and doc_repetition_stats
    # (last-ranked) wait for r16.
    "embedding_knn_graph": 0,
    "dedup_embedding_lsh": 0,
    # (0) r15 NEW: bpe_vocab_merges (iterative BPE merge trainer);
    # dedup_keep_canonical (last-ranked fill) waits for r16. Fill 9->8.
    "bpe_vocab_merges": 0,
    # (0) r15 NEW: semantic_dup_clusters (mutual-kNN components);
    # dedup_exact (last-ranked fill) waits for r16. Fill 8->7.
    "semantic_dup_clusters": 0,
    # (0) r15 changed — kept current as the round progresses.
    # pq.py changed (_lut_wide explicit-scatter build, sparse-codebook
    # robustness — ADVICE r14 medium): every query transiting the
    # wide ADC LUT rides it — ann_pq_topk, ann_ivfpq_topk, and the
    # dispatchers ann_auto_topk / ann_index_append whose PQ/ADC
    # branches consume it. dedup.py changed (eval-broadcast gate now
    # counts the actual eval side — ADVICE r14 low):
    # decontaminate_embedding. probe.py changed (gate/exec PATH
    # agreement — ADVICE r14 low): probe_source_events is already
    # owed above. Five promotions -> fill trimmed 16 -> 11, dropping
    # the last-ranked rows (q3_shipping_priority,
    # q17_small_quantity_revenue, q12_priority_shipping, pii_redact,
    # leakage_safe_split).
    "ann_pq_topk": 0,
    "ann_ivfpq_topk": 0,
    "ann_auto_topk": 0,
    "ann_index_append": 0,
    "decontaminate_embedding": 0,
    # (1) fill to 50, ranked by prior-row age (gen_rotation.py)
    "active_sources": 1,
    "ann_cosine_topk": 1,
    "bm25_topk": 1,
    "daily_report_pipeline": 1,
    "decontaminate_overlap": 1,
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
    "embedding_knn_graph": "bucket+verify+rank materialized in fn()",
    "bpe_vocab_merges": "iterative merge trainer; 6-row result built on the driver",
    "semantic_dup_clusters": "knn graph checkpoint + connected-components loop in fn()",
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
