"""stream_processing_test_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference live-stream quality
monitoring service (Sea-Otter-Labs/Stream-Processing-Test, surveyed in
/root/repo/SURVEY.md) as an idiomatic Spark library:

- probe-outcome events are an append-only ``events`` table (batch
  DataFrames + Structured Streaming with 1-day tumbling windows);
- the reference's hand-written MySQL queries become declarative
  DataFrame pipelines (conditional aggregation, semi-join subqueries,
  first-non-empty rollups, broadcast dimension joins);
- sinks (CSV, markdown report batches, webhook, keyed upsert) are thin
  adapters over ``foreachBatch`` / pure formatting functions;
- beyond the reference surface, large-scale training-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal
  columns) are first-class.

Every operator is a pure ``DataFrame -> DataFrame`` function designed
for a 1000-executor / 100 TB deployment but tested on ``local[*]``.
"""

from stream_processing_test_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
