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

# Round-4 rotation (VERDICT r3 items 1+4): the driver checks a
# 50-query prefix, so put (0) every batch/streaming consumer of the
# events table — all 24 changed this round by the Spark-4 loader fix
# (tables.normalize_event_ts) and need fresh green rows — then (1) the
# 20 queries the r3 run didn't enumerate (their newest row is r2), then
# (2) ops whose implementation changes this round (cluster convergence,
# IVF re-seed, probe cancellation, multimodal kernel). Unlisted queries
# keep ``10 + tier`` and fill any remaining slots in registration
# order; all of them have green r3 rows.
_ROTATION_TIERS: dict[str, int] = {
    # (0) events consumers — loader changed this round
    "asof_click_attribution": 0,
    "daily_scores": 0,
    "day_close_trigger": 0,
    "engaged_users_setops": 0,
    "error_labels": 0,
    "failing_programs": 0,
    "monotonic_violations": 0,
    "per_source_rollup": 0,
    "props_json_stats": 0,
    "range_join_error_context": 0,
    "records_in_window": 0,
    "report_batches": 0,
    "resolution_classify": 0,
    "rolling_user_stats": 0,
    "session_windows": 0,
    "sql_daily_event_summary": 0,
    "streaming_click_purchase_join": 0,
    "streaming_daily_scores": 0,
    "streaming_dedup": 0,
    "streaming_failure_streaks": 0,
    "top_events_per_user": 0,
    "user_cardinality": 0,
    "user_cardinality_approx": 0,
    "users_without_big_purchase": 0,
    # (1) newest driver row is r2
    "active_sources": 1,
    "ann_cosine_topk": 1,
    "dedup_embedding_cosine": 1,
    "dedup_exact": 1,
    "dedup_ngram_jaccard": 1,
    "doc_chunking": 1,
    "doc_fingerprint": 1,
    "doc_quality_score": 1,
    "embedding_centroids": 1,
    "embedding_norm_stats": 1,
    "lang_id_ngram": 1,
    "program_match": 1,
    "revenue_rollup": 1,
    "source_mixing": 1,
    "stratified_sample": 1,
    "suppliers_with_bulk_items": 1,
    "tfidf_top_terms": 1,
    "token_count": 1,
    # (2) new or implementation-changed this round. 24+18+9 overflows
    # the 50-row window by one; dup_clusters sits out — its change was
    # performance-only (in-job convergence) and connected_components
    # correctness is covered in-window by dedup_keep_canonical and
    # corpus_curation_pipeline (both oracle-checked through the same
    # propagation loop). It rotates back in r5.
    "attribute_rollup": 2,
    "daily_report_pipeline": 2,
    "dedup_keep_canonical": 2,
    "corpus_curation_pipeline": 2,
    "ann_ivf_topk": 2,
    "probe_source_events": 2,
    "multimodal_features": 2,
    "multimodal_preprocess": 2,
    "dup_clusters": 3,
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
