"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` operators.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a (uri, byte_range) pointer into blob storage),
metadata is a typed struct, and decode/resize/feature-extract run as
``mapInPandas`` stages — per-partition Arrow batches, bounded memory,
no driver involvement.

The decode kernel is REAL for the formats the pure-stdlib codec layer
(:mod:`.codecs`) covers — full PNG pixel decode, JPEG/GIF/BMP header
dimensions, WAV PCM samples — and falls back to a clearly-marked
deterministic stub for payloads that sniff as none of those (synthetic
text-byte corpora; video containers, which genuinely need native
codecs). Optional native libraries are import-guarded: when PIL is
present it extends image coverage beyond the stdlib formats, and its
absence never changes results for the stdlib-decodable formats.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.llm import codecs
from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

try:  # optional native codec; stdlib formats never depend on it
    from PIL import Image as _PIL_Image  # noqa: N812
except Exception:  # pragma: no cover - PIL absent in this container
    _PIL_Image = None

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes INT, "
    "width INT, height INT, features ARRAY<DOUBLE>"
)


def _decode_stub(payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake for payloads no real
    codec covers (synthetic text-byte corpora; video containers).

    Produces stable pseudo-features from the payload bytes so tests
    can assert end-to-end plumbing regardless of installed codecs."""
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


def _image_features(
    width: int, height: int, channels: int, pixels: bytes
) -> list[float]:
    """Deterministic 8-dim features from raw samples: per-channel means
    (padded to 4), overall mean, overall population std, aspect, and
    channel count — all normalized and rounded to 6 decimals."""
    n_px = width * height
    ch_means = []
    for c in range(channels):
        ch_means.append(sum(pixels[c::channels]) / n_px / 255.0)
    ch_means += [0.0] * (4 - channels)
    total = sum(pixels)
    mean = total / len(pixels)
    var = sum((p - mean) ** 2 for p in pixels) / len(pixels)
    feats = ch_means + [
        mean / 255.0,
        (var**0.5) / 255.0,
        width / (width + height),
        channels / 4.0,
    ]
    return [round(f, 6) for f in feats]


def _audio_features(meta: dict) -> list[float]:
    """8-dim features from PCM samples: mean |amp|, RMS, zero-crossing
    rate, duration, channels, sample rate — normalized, rounded."""
    s = meta["samples"]
    if s:
        mean_abs = sum(abs(x) for x in s) / len(s) / 32768.0
        rms = (sum(x * x for x in s) / len(s)) ** 0.5 / 32768.0
        zc = sum(
            1 for i in range(1, len(s)) if (s[i - 1] < 0) != (s[i] < 0)
        ) / max(1, len(s) - 1)
    else:
        mean_abs = rms = zc = 0.0
    feats = [
        mean_abs,
        rms,
        zc,
        min(meta["duration_s"] / 60.0, 1.0),
        meta["channels"] / 2.0,
        meta["sample_rate"] / 48000.0,
        0.0,
        0.0,
    ]
    return [round(f, 6) for f in feats]


def decode_payload(payload: bytes) -> dict:
    """The decode kernel: sniff the container format and decode with
    the real codec when one applies, else fall back to the stub.

    PNG gets a full pixel decode (features are real channel stats);
    JPEG/GIF/BMP get real dimensions with byte-derived features (pixel
    access for those needs PIL, used when import succeeds); WAV gets
    PCM sample stats (width=sample_rate, height=channels by
    convention). Unknown formats → deterministic stub."""
    fmt = codecs.sniff(payload)
    n = len(payload)
    try:
        if fmt == "png":
            w, h, ch, px = codecs.decode_png(payload)
            return {
                "n_bytes": n,
                "width": w,
                "height": h,
                "features": _image_features(w, h, ch, px),
            }
        if fmt in ("jpeg", "gif", "bmp"):
            if _PIL_Image is not None:  # pragma: no cover - PIL absent here
                import io

                img = _PIL_Image.open(io.BytesIO(payload)).convert("RGBA")
                return {
                    "n_bytes": n,
                    "width": img.width,
                    "height": img.height,
                    "features": _image_features(
                        img.width, img.height, 4, img.tobytes()
                    ),
                }
            w, h = {
                "jpeg": codecs.jpeg_size,
                "gif": codecs.gif_size,
                "bmp": codecs.bmp_size,
            }[fmt](payload)
            return {
                "n_bytes": n,
                "width": w,
                "height": h,
                "features": _decode_stub(payload)["features"],
            }
        if fmt == "wav":
            meta = codecs.decode_wav(payload)
            return {
                "n_bytes": n,
                "width": meta["sample_rate"],
                "height": meta["channels"],
                "features": _audio_features(meta),
            }
    except (ValueError, struct.error):
        # a sniffed-but-corrupt payload degrades to the stub rather
        # than failing the batch — bad files are data, not bugs
        pass
    return _decode_stub(payload)


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
            decoded = pdf["payload"].map(lambda p: decode_payload(bytes(p)))
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
    pipeline has. The kernel is format-dispatching (real PNG/WAV/...
    decode via llm.codecs; these text payloads take the deterministic
    stub branch). Rows-only driver check; tests/test_codecs.py pins
    the kernel's real-format behavior and determinism."""
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


def _resize_one(payload: bytes, target: int) -> tuple[int, int, int, int, bytes]:
    """(w, h, rw, rh, resized_payload) for one image payload.

    Shorter side scales to ``target`` (never upscaled), aspect kept.
    PNG payloads get a REAL nearest-neighbor pixel resample and are
    re-encoded as PNG (pure-stdlib codec); payloads the codec layer
    cannot decode keep the deterministic stub resample (proportional
    byte truncation), preserving the bytes-shrink-with-resolution
    property either way."""
    meta = decode_payload(payload)
    w, h = meta["width"], meta["height"]
    scale = min(target / min(w, h), 1.0)
    rw = max(1, int(w * scale))
    rh = max(1, int(h * scale))
    if codecs.sniff(payload) == "png":
        try:
            pw, ph, ch, px = codecs.decode_png(payload)
            resized = codecs.encode_png(
                rw, rh, ch, codecs.resize_nearest(pw, ph, ch, px, rw, rh)
            )
            return w, h, rw, rh, resized
        except ValueError:
            pass  # unsupported PNG flavor: stub path below
    # STUB resample for non-decodable payloads
    ratio = (rw * rh) / (w * h)
    return w, h, rw, rh, payload[: max(1, int(len(payload) * ratio))]


def resize_images(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize stage: scale each image's shorter side to ``target``
    keeping aspect ratio — the standard vision-model preprocessing.
    Real pixel-domain resample for codec-supported formats (see
    :func:`_resize_one`); schema, batching and partitioning are
    identical for the real and stub paths."""
    from stream_processing_test_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_one(bytes(p), target) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [r[0] for r in resized],
                    "height": [r[1] for r in resized],
                    "resized_width": [r[2] for r in resized],
                    "resized_height": [r[3] for r in resized],
                    "payload": [r[4] for r in resized],
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
