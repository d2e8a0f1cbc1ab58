"""Multi-format ingestion for the reference's event envelope.

The reference emits each probe outcome as a JSON object
(StreamTest.cpp:283-299) that is INSERTed into MySQL; the JSON is a
transport envelope, not a storage format (SURVEY §1). This adapter
accepts that envelope from any of the formats a real deployment lands
events in — JSON-lines, CSV, parquet, or ORC — and applies the §1.3 edge
normalization in ONE place:

- explicit ``PROBE_EVENT_SCHEMA`` (never inferSchema: inference scans
  data and guesses types per-file — a schema-drift hazard at 100 TB);
- ``'' -> NULL`` on every attribute string column (the reference uses
  the empty string as its missing-value sentinel; engine-side the
  sentinel is NULL, re-materialized as ``''`` only at MySQL-compatible
  edges). CSV's parser already maps empty fields to NULL — the
  ``nullif`` pass is idempotent, so all three formats land identically;
- ``created_time`` parsed to a timestamp from the reference's
  ``%Y-%m-%d %H:%M:%S`` UTC strings (transport formats carry it as a
  string; parquet may already be typed — handled by dtype).

Both batch (``read_probe_events``) and Structured Streaming
(``stream_probe_events``) share the schema and normalization through
the same helpers, so the two paths cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_processing_test_spark.schemas import PROBE_EVENT_SCHEMA

_FORMATS = ("json", "csv", "parquet", "orc")

# In transport formats the timestamp travels as its reference string
# form; the typed schema applies after parsing in _normalize.
TRANSPORT_SCHEMA = T.StructType(
    [
        f
        if f.name != "created_time"
        else T.StructField("created_time", T.StringType(), True)
        for f in PROBE_EVENT_SCHEMA.fields
    ]
)


def _normalize(df: DataFrame) -> DataFrame:
    """§1.3 edge normalization: '' -> NULL on attribute strings, and
    created_time parsed to TimestampType when it arrived as a string."""
    cols = []
    for f in PROBE_EVENT_SCHEMA.fields:
        c = F.col(f.name)
        if f.name == "created_time":
            if isinstance(df.schema["created_time"].dataType, T.StringType):
                c = F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss")
        elif isinstance(f.dataType, T.StringType):
            c = F.nullif(c, F.lit(""))
        cols.append(c.alias(f.name))
    return df.select(*cols)


def _read(reader, fmt: str, path: str) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    typed = fmt in ("parquet", "orc")  # columnar formats carry the typed ts
    schema = PROBE_EVENT_SCHEMA if typed else TRANSPORT_SCHEMA
    reader = reader.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return _normalize(reader.load(path))


def read_probe_events(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """Batch read of envelope events from ``path`` in ``fmt``
    (json = JSON-lines, csv, parquet, orc), schema-enforced and
    edge-normalized."""
    return _read(spark.read, fmt, path)


def stream_probe_events(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """Streaming twin of :func:`read_probe_events` — same schema, same
    options, same normalization, file-source micro-batches."""
    return _read(spark.readStream, fmt, path)
