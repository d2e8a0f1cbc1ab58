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


def register(
    name: str,
    oracle: str | None = None,
    survey_ops: str = "",
    tier: int = 1,
):
    """Decorator: register ``fn`` as a named query with optional oracle.

    ``tier`` orders driver-side enumeration (``all_queries`` sorts by
    it, stable within a tier). The round-1 driver correctness gate
    checked only a prefix of the registry, silently skipping the
    LLM/streaming surface that happened to enumerate last — so queries
    whose driver row matters most (new/changed this round, previously
    skipped) register with tier=0, and long-stable well-proven shapes
    (the TPC-H suite) with tier=2."""

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
            _REGISTRY.values(), key=lambda s: s.tier
        )  # stable: insertion order within a tier
    }
