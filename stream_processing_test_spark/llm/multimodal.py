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


@register(
    "multimodal_features", oracle=None, survey_ops="§7-multimodal,mapInPandas", tier=0
)
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


# ---------------------------------------------------------------------------
# Resize + frame-sample stages (stubbed kernels, real plumbing)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, "
    "resized_width INT, resized_height INT, payload BINARY"
)


def resize_images(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize stage: scale each image's shorter side to ``target``
    keeping aspect ratio — the standard vision-model preprocessing.

    The geometry math is real; the pixel resample is the stub (PIL is
    not installed): the payload passes through unchanged but truncated
    proportionally to the area ratio, which preserves the
    bytes-shrink-with-resolution property tests rely on. Swap the body
    marked STUB for ``PIL.Image.resize`` in production — schema,
    batching and partitioning stay identical."""
    from stream_processing_test_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(lambda p: _decode_stub(bytes(p)))
            w = meta.map(lambda d: d["width"])
            h = meta.map(lambda d: d["height"])
            scale = (target / pd.concat([w, h], axis=1).min(axis=1)).clip(upper=1.0)
            rw = (w * scale).astype(int).clip(lower=1)
            rh = (h * scale).astype(int).clip(lower=1)
            # STUB resample: proportional byte truncation stands in for
            # the real pixel-domain resize
            ratio = (rw * rh) / (w * h)
            payload = [
                bytes(p)[: max(1, int(len(bytes(p)) * r))]
                for p, r in zip(pdf["payload"], ratio)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": w,
                    "height": h,
                    "resized_width": rw,
                    "resized_height": rh,
                    "payload": payload,
                }
            )

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id BIGINT, frame_index INT, frame_ts_ms BIGINT, frame_payload BINARY"
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: explode each video payload into
    ``n_frames`` evenly-spaced frames — the 1-row → N-rows shape every
    video pipeline needs (the row explosion happens inside
    mapInPandas, so output batches stay Arrow-bounded even when
    n_frames is large).

    STUB decoder: frame payloads are deterministic byte slices standing
    in for decoded frames; a real impl wraps pyav/ffmpeg. The sampling
    grid (even spacing over a fake duration derived from payload size)
    is real."""
    from stream_processing_test_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                duration_ms = (len(b) % 300 + 1) * 1000  # STUB duration
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_index": i,
                            "frame_ts_ms": int(duration_ms * i / n_frames),
                            "frame_payload": b[i * step : (i + 1) * step] or b"\x00",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


@register(
    "multimodal_preprocess", oracle=None, survey_ops="§7-multimodal,mapInPandas", tier=0
)
def multimodal_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample composed: images through the resize stage,
    videos exploded into sampled frames, then a relational summary —
    the full preprocessing DAG a multimodal training pipeline runs.
    Rows-only driver check; pytest asserts the geometry invariants."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    resized = resize_images(media.filter(F.col("media_type") == "image"))
    frames = sample_frames(media.filter(F.col("media_type") == "video"))
    r = resized.agg(
        F.count("*").alias("n"),
        F.round(F.avg("resized_width"), 2).alias("avg_w"),
        F.round(F.avg("resized_height"), 2).alias("avg_h"),
    ).select(F.lit("resize").alias("stage"), "n", "avg_w", "avg_h")
    f = frames.agg(
        F.count("*").alias("n"),
        F.round(F.avg("frame_index"), 2).alias("avg_w"),
        F.round(F.avg(F.col("frame_ts_ms") / 1000.0), 2).alias("avg_h"),
    ).select(F.lit("frames").alias("stage"), "n", "avg_w", "avg_h")
    return r.unionAll(f)
