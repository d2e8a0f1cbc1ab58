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

# Round-13 rotation: the driver checks a 50-query prefix. The owed
# list is now COMPUTED, not hand-maintained (VERDICT r12 item 7):
# ``python tools/gen_rotation.py [--changed ...]`` reads every
# CORRECTNESS_r*.json, finds the stale-minimum cohort (queries whose
# newest driver row is oldest — they MUST lead the window), and ranks
# the fill cohort by prior-row age. This dict is its output for r13,
# plus the round's new/changed queries (kept current as the round
# progresses, per the rotation contract).
#
# Tier (0) = the TWENTY-EIGHT r10-row deferrals the r12 verdict bound
# r13 to lead with (tool-verified identical to the hand list), plus
# the r13 new/changed queries listed below. Tier (1) = 18 fill rows:
# the five r11-new single-row queries, then the r11 cohort ranked by
# prior-row age (prior r8 before prior r9) — trimmed from 22 as each
# new/changed query entered tier 0, dropping the last-ranked fill
# rows (decayed_user_scores, cohort_retention, attribute_rollup,
# ann_lsh_topk, user_cardinality, sql_daily_event_summary — all owed
# r14 rows). Unlisted queries keep ``10 + tier``.
_ROTATION_TIERS: dict[str, int] = {
    # (0) the twenty-eight r10-row deferrals (tools/gen_rotation.py)
    "active_sources": 0,
    "ann_cosine_topk": 0,
    "bm25_topk": 0,
    "daily_report_pipeline": 0,
    "decontaminate_overlap": 0,
    "dedup_exact": 0,
    "dedup_keep_canonical": 0,
    "doc_quality_score": 0,
    "doc_repetition_stats": 0,
    "embedding_centroids": 0,
    "embedding_norm_stats": 0,
    "leakage_safe_split": 0,
    "pii_redact": 0,
    "q12_priority_shipping": 0,
    "q17_small_quantity_revenue": 0,
    "q3_shipping_priority": 0,
    "range_join_error_context": 0,
    "session_windows": 0,
    "stratified_sample": 0,
    "streaming_daily_scores": 0,
    "streaming_daily_scores_update": 0,
    "streaming_dedup": 0,
    "substring_dup_coverage": 0,
    "suppliers_with_bulk_items": 0,
    "tfidf_top_terms": 0,
    "token_count": 0,
    "top_events_per_user": 0,
    "users_without_big_purchase": 0,
    # (0) r13 new/changed — kept current as the round progresses:
    # ann_auto_topk NEW (the measured ANN path selector, VERDICT r12
    # item 3); ann_ivf_topk + ann_ivfpq_topk changed (the guarded-BLAS
    # assignment pass, VERDICT r12 item 4). The three last-ranked fill
    # rows (decayed_user_scores, cohort_retention, attribute_rollup)
    # dropped to keep the window at exactly 50.
    "ann_auto_topk": 0,
    "ann_ivf_topk": 0,
    "ann_ivfpq_topk": 0,
    # streaming_click_purchase_outer NEW r13 (left-outer stream-stream
    # interval join; outer rows = watermark-eviction evidence). With
    # 32 tier-0 entries the fill is trimmed to 18 — the four
    # last-ranked fill rows by gen_rotation's prior-row-age order
    # (decayed_user_scores, cohort_retention, attribute_rollup,
    # ann_lsh_topk) wait for r14
    "streaming_click_purchase_outer": 0,
    # decontaminate_embedding NEW r13 (embedding-space decontamination
    # tier; asymmetric eval-probe LSH); user_cardinality (next-ranked
    # fill) waits for r14 to hold the window at 50
    "decontaminate_embedding": 0,
    # ann_index_append NEW r13 (frozen-quantizer incremental ingest);
    # sql_daily_event_summary (next-ranked fill) waits for r14
    "ann_index_append": 0,
    # (1) fill to 50, ranked by prior-row age (gen_rotation.py)
    "class_balanced_sample": 1,
    "lang_sampling_weights": 1,
    "quality_calibrated_filter": 1,
    "sequence_pack": 1,
    "streaming_enriched_rollup": 1,
    "daily_scores": 1,
    "dedup_embedding_cosine": 1,
    "doc_chunking": 1,
    "engaged_users_setops": 1,
    "envelope_rollup_csv": 1,
    "error_labels": 1,
    "monotonic_violations": 1,
    "records_in_window": 1,
    "report_batches": 1,
    "resolution_classify": 1,
    "source_mixing": 1,
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
