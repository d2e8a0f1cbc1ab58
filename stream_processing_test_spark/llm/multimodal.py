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
import zlib
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
            if w <= 0 or h <= 0:
                # header parses but declares a degenerate image — the
                # stub fallback, not a downstream ZeroDivisionError
                raise ValueError(f"{fmt} with zero dimension")
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
    except (
        ValueError,
        struct.error,
        zlib.error,  # corrupt PNG deflate stream (not a ValueError)
        OSError,  # PIL UnidentifiedImageError / truncated-file errors
        ZeroDivisionError,
        IndexError,
    ):
        # a sniffed-but-corrupt payload degrades to the stub rather
        # than failing the batch — bad files are data, not bugs.
        # (Codec *bugs* on valid files still fail loudly: test_codecs
        # exercises the decoders directly, without this net.)
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


def _features_oracle() -> str:
    """DuckDB replay of the stub kernel + the per-media_type rollup.

    Replayable because (a) the stub's features are a pure function of
    the payload bytes, and (b) the fixture text is pure ASCII at every
    sf (asserted: octet_length(encode(text)) == length(text) for all
    rows), so byte k of the UTF-8 payload == unicode(substr(text, k+1,
    1)). feats[0] sums bytes 0,8,...,56 of the 64-byte head, mod 251,
    / 251 — emitted positionally below."""
    f0 = (
        "list_sum(list_transform([0,8,16,24,32,40,48,56], k -> "
        "CASE WHEN k < LEAST(length(text), 64) "
        "THEN unicode(substring(text, k + 1, 1)) ELSE 0 END)) % 251 / 251.0"
    )
    return f"""
WITH d AS (
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           length(text) AS n_bytes,
           {f0} AS f0
    FROM documents)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_bytes), 4) AS avg_bytes,
       ROUND(AVG(f0), 4) AS avg_f0
FROM d GROUP BY media_type
"""


@register(
    "multimodal_features",
    oracle=_features_oracle(),
    survey_ops="§7-multimodal,mapInPandas",
    tier=0,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on synthetic payloads: documents'
    text bytes stand in for media blobs (UTF-8 encode → binary column
    + metadata), then the mapInPandas decode/feature stage, then a
    relational post-aggregation — the exact shape a real image corpus
    pipeline has. The kernel is format-dispatching (real PNG/WAV/...
    decode via llm.codecs; these text payloads take the deterministic
    stub branch). Oracle-checked end-to-end — the Arrow plumbing, the
    kernel dispatch AND the stub math are replayed in SQL (possible
    because the fixture text is ASCII; see _features_oracle);
    tests/test_codecs.py pins the kernel's real-format behavior."""
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
    if min(w, h) <= 0:
        # degenerate metadata (e.g. a WAV routed through image resize
        # reports width=sample_rate=0): pass through untouched
        return w, h, w, h, payload
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


def _preprocess_oracle() -> str:
    """DuckDB replay of the resize geometry and the frame-sampling
    grid. Text payloads take the stub kernel (w/h derived from byte
    length; 4 evenly-spaced frames over a length-derived duration), so
    both stages are pure functions of length(text) — same ASCII
    precondition as _features_oracle, same trunc-toward-zero float
    semantics as the Python int() casts."""
    return """
WITH img AS (
    SELECT (length(text) % 640) + 1 AS w, (length(text) % 480) + 1 AS h
    FROM documents WHERE doc_id % 3 = 0),
r AS (
    SELECT GREATEST(1, CAST(trunc(w * LEAST(224.0 / LEAST(w, h), 1.0)) AS INT)) AS rw,
           GREATEST(1, CAST(trunc(h * LEAST(224.0 / LEAST(w, h), 1.0)) AS INT)) AS rh
    FROM img),
vid AS (
    SELECT ((length(text) % 300) + 1) * 1000 AS dur
    FROM documents WHERE doc_id % 3 = 2),
fr AS (
    SELECT t.i AS frame_index, CAST(trunc(dur * t.i / 4.0) AS BIGINT) AS ts_ms
    FROM vid, range(4) t(i))
SELECT 'resize' AS stage, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(rw), 2) AS avg_w, ROUND(AVG(rh), 2) AS avg_h
FROM r
UNION ALL
SELECT 'frames' AS stage, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(frame_index), 2) AS avg_w,
       ROUND(AVG(ts_ms / 1000.0), 2) AS avg_h
FROM fr
"""


@register(
    "multimodal_preprocess",
    oracle=_preprocess_oracle(),
    survey_ops="§7-multimodal,mapInPandas",
    tier=0,
)
def multimodal_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample composed: images through the resize stage,
    videos exploded into sampled frames, then a relational summary —
    the full preprocessing DAG a multimodal training pipeline runs.
    Oracle-checked end-to-end (stub geometry replayed in SQL); pytest
    asserts the geometry invariants and the real-PNG resample path."""
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


# ---------------------------------------------------------------------------
# Multimodal near-duplicate dedup (VERDICT r11 item 4)
# ---------------------------------------------------------------------------

# Fingerprint geometry mirrors the text SimHash family (llm/dedup.py):
# 60 bits -> 4 x 15-bit blocks, pigeonhole guarantees any pair at
# hamming <= 3 shares a block. 60 (not 64) keeps the packed value
# positive in a signed long in both engines.
MM_FP_BITS = 60
MM_FP_BLOCKS = 4
_MM_BLOCK_BITS = MM_FP_BITS // MM_FP_BLOCKS  # 15
_MM_BLOCK_MASK = (1 << _MM_BLOCK_BITS) - 1
MM_FP_MAX_HAMMING = 3
# Hot-block cap: a DEGENERATE corpus (e.g. near-constant features —
# random-pixel images all average to the same channel stats) packs
# every doc into one bucket and the band self-join goes quadratic.
# Blocks holding more than this many fingerprints are dropped from
# candidate generation (the rare-shingle DF_MAX idiom): cost is
# bounded at ~n * cap per block column, recall degrades only for
# pairs whose EVERY shared block is hot. Expected occupancy at
# uniform 15-bit blocks is n/32768 per media_type, so the cap is
# ~70x headroom at the mm ladder's 500k-doc rung.
MM_BLOCK_DF_MAX = 1024


def multimodal_fingerprints(feats: DataFrame) -> DataFrame:
    """The sign-LSH fingerprint stage of :func:`multimodal_fingerprint_pairs`
    alone: (doc_id, media_type, features) → (doc_id, media_type, fp).
    Factored out so evidence probes (the mm ladder's hot-block count)
    can inspect fingerprint/block occupancy without running the join;
    the float/ordering contract is documented on the pairs function."""
    from stream_processing_test_spark.llm.hashing import plane_weights

    W = plane_weights(1, MM_FP_BITS, FEATURE_DIM)[0]
    l1 = feats.selectExpr(
        "doc_id",
        "media_type",
        *[
            f"element_at(features, {j + 1}) - 0.5D AS cf{j}"
            for j in range(FEATURE_DIM)
        ],
    )
    terms = []
    for p in range(MM_FP_BITS):
        dot = " + ".join(
            f"cf{j} * {W[p][j]!r}D" for j in range(FEATURE_DIM)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0D THEN {1 << p}L ELSE 0L END)")
    return l1.selectExpr(
        "doc_id", "media_type", f"({' + '.join(terms)}) AS fp"
    )


def multimodal_fingerprint_pairs(
    feats: DataFrame, block_df_max: int = MM_BLOCK_DF_MAX
) -> DataFrame:
    """Near-dup pairs from (doc_id, media_type, features) rows:
    sign-LSH fingerprint + banded hamming join, WITHIN media_type.

    Each 8-dim feature vector is centered at 0.5 (the stub features
    are uniform in [0,1)) and projected onto MM_FP_BITS deterministic
    hyperplanes (:func:`hashing.plane_weights` — the same portable
    family the embedding-LSH oracles replay); bit p is the sign of
    projection p. The 480 multiply-adds run as ONE literal selectExpr
    layer inside the scan stage (the pq_encode string-building idiom:
    no py4j per-op cost, left-associative ``+`` chains matching the
    oracle's ``list_sum`` fold exactly — no rounding bridge needed,
    both engines compute identical IEEE doubles in identical order).
    Candidates come from the Manku-style block join (4 x 15-bit
    bands), capped per block by ``block_df_max``, verified by exact
    ``bit_count(xor)``. Shuffles: the fingerprint aggregation is
    map-free (one pass), the block join shuffles |docs| x 4 skinny
    rows, and the verify is an integer op on the joined row — the
    same bounded shape as ``dedup_simhash``."""
    from stream_processing_test_spark.session import finish_with

    fp = multimodal_fingerprints(feats).persist()

    blocks = fp.select(
        "doc_id",
        "media_type",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftrightunsigned("fp", _MM_BLOCK_BITS * i)
                        .bitwiseAND(F.lit(_MM_BLOCK_MASK))
                        .alias("block"),
                    )
                    for i in range(MM_FP_BLOCKS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "media_type", "fp", "bb.block_id", "bb.block")
    keys = ["media_type", "block_id", "block"]
    bc = (
        blocks.groupBy(*keys)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= block_df_max)
        .select(*keys)
    )
    kept = blocks.join(bc, keys)
    a = kept.select(
        F.col("doc_id").alias("doc_a"), F.col("fp").alias("h_a"), *keys
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), F.col("fp").alias("h_b"), *keys
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long")
    result = (
        a.join(b, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("media_type", "doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= MM_FP_MAX_HAMMING)
    )
    return finish_with(result, fp)


def _stub_feature_sql(i: int) -> str:
    """DuckDB expression for stub feature ``i`` — byte-sum math from
    :func:`_decode_stub` replayed verbatim (the _features_oracle
    formula, generalized to all FEATURE_DIM lanes)."""
    idxs = "[" + ",".join(str(i + FEATURE_DIM * k) for k in range(8)) + "]"
    return (
        f"list_sum(list_transform({idxs}, k -> "
        "CASE WHEN k < LEAST(length(text), 64) "
        "THEN unicode(substring(text, k + 1, 1)) ELSE 0 END)) % 251 / 251.0"
    )


def _dedup_multimodal_oracle() -> str:
    """Full-chain DuckDB replay: stub features (ASCII precondition as
    _features_oracle) -> plane projections (plane_weights_cte
    regenerates the identical doubles; list_sum folds left-to-right
    like the Spark expression's ``+`` chain) -> sign bits -> packed
    fingerprint -> capped block join -> exact hamming verify."""
    from stream_processing_test_spark.llm.hashing import plane_weights_cte

    f_list = ", ".join(_stub_feature_sql(i) for i in range(FEATURE_DIM))
    fold = (
        f"list_sum(list_transform(range({FEATURE_DIM}), "
        "j -> hp.w[j+1] * (d.f[j+1] - 0.5)))"
    )
    return f"""
WITH d AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           [{f_list}] AS f
    FROM documents),
{plane_weights_cte(1, MM_FP_BITS, FEATURE_DIM)},
bits AS (
    SELECT d.doc_id, d.media_type, hp.p, {fold} AS dot
    FROM d, hp),
fp AS (
    SELECT doc_id, media_type,
           SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS fp
    FROM bits GROUP BY doc_id, media_type),
blocks AS (
    SELECT doc_id, media_type, fp, i,
           (fp >> ({_MM_BLOCK_BITS} * i)) & {_MM_BLOCK_MASK} AS block
    FROM fp, range({MM_FP_BLOCKS}) ii(i)),
bc AS (
    SELECT media_type, i, block FROM blocks
    GROUP BY media_type, i, block HAVING COUNT(*) <= {MM_BLOCK_DF_MAX}),
kept AS (SELECT b.* FROM blocks b JOIN bc USING (media_type, i, block)),
cand AS (
    SELECT DISTINCT a.media_type, a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.fp, b.fp)) AS hd
    FROM kept a JOIN kept b
      ON a.media_type = b.media_type AND a.i = b.i AND a.block = b.block
     AND a.doc_id < b.doc_id)
SELECT media_type, CAST(doc_a AS BIGINT) AS doc_a,
       CAST(doc_b AS BIGINT) AS doc_b, CAST(hd AS BIGINT) AS hamming
FROM cand WHERE hd <= {MM_FP_MAX_HAMMING}
"""


@register(
    "dedup_multimodal",
    oracle=_dedup_multimodal_oracle(),
    survey_ops="§7-dedup,§7-multimodal,mapInPandas,SimHash",
    tier=0,
)
def dedup_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup dedup — the feature-space twin of
    ``dedup_simhash``: payloads decode to 8-dim feature vectors
    (:func:`extract_features` — the Arrow mapInPandas kernel, real
    codecs where they apply, deterministic stub otherwise), vectors
    sign-quantize to a 60-bit fingerprint on deterministic
    hyperplanes, and the banded hamming join pairs near-identical
    media WITHIN each media_type (an image never dedups against an
    audio clip, however similar the bytes). Oracle-checked
    END-TO-END: the stub features, the plane doubles, the sign bits
    and the capped band join are all replayed in SQL. The real-codec
    path (PNG channel stats) rides the same fingerprint machinery —
    priced on the mm ladder, pinned by the codec pytests."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return multimodal_fingerprint_pairs(extract_features(media))
