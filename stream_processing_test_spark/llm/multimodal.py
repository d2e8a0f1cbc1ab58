"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` operators.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a (uri, byte_range) pointer into blob storage),
metadata is a typed struct, and decode/resize/feature-extract run as
``mapInPandas`` stages — per-partition Arrow batches, bounded memory,
no driver involvement. The actual codecs (PIL/ffmpeg/torchaudio) are
NOT in this container, so the decode kernel is stubbed: a clearly
marked deterministic fake keeps the Spark-side contract (schema,
batching, partitioning) real and testable, and a real deployment swaps
``_decode_stub`` for the codec call.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes INT, "
    "width INT, height INT, features ARRAY<DOUBLE>"
)


def _decode_stub(payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake standing in for a real
    image/audio decoder (PIL / ffmpeg are not installed here).

    Produces stable pseudo-features from the payload bytes so tests
    can assert end-to-end plumbing. Swap this single function for the
    real codec in production; everything around it (Arrow batching,
    schema, partitioning) is the production shape."""
    n = len(payload)
    head = payload[:64]
    feats = [
        float(sum(head[i::FEATURE_DIM]) % 251) / 251.0
        for i in range(FEATURE_DIM)
    ]
    return {
        "n_bytes": n,
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "features": feats,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, payload).

    Runs per Arrow batch; memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch regardless of
    partition size — the required property when payloads are MBs each.
    """
    from stream_processing_test_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda p: _decode_stub(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": decoded.map(lambda d: d["n_bytes"]),
                    "width": decoded.map(lambda d: d["width"]),
                    "height": decoded.map(lambda d: d["height"]),
                    "features": decoded.map(lambda d: d["features"]),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


@register("multimodal_features", oracle=None, survey_ops="§7-multimodal,mapInPandas")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on synthetic payloads: documents'
    text bytes stand in for media blobs (UTF-8 encode → binary column
    + metadata), then the mapInPandas decode/feature stage, then a
    relational post-aggregation — the exact shape a real image corpus
    pipeline has. Rows-only driver check (the decode stub is
    Python-side); pytest asserts determinism and schema."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(media)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg(F.element_at("features", 1)), 4).alias("avg_f0"),
        )
    )
