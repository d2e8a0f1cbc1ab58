"""Probe source connector (S4): the reference's ffmpeg stream prober
(``OperationStream``, StreamTest.cpp:1377-1675) as a pluggable Spark
ingestion stage.

The reference forks 25 child processes per 10-s round, each opening a
stream URL with ffmpeg, decoding ≤10 s, and emitting exactly ONE
outcome event — success (item=0) or the first error from the 17-code
taxonomy — with extracted metadata (protocol, bitrate "N kb/s",
duration, codecs, "WxH" resolution, sample rate; StreamTest.cpp:
1419-1474) and a server-stamped UTC ``created_time`` (:296).

Spark shape: probing is a *source*, not a query operator. A dimension
DataFrame of sources fans out across executors via ``mapInPandas``;
each Arrow batch probes its URLs (bounded per-task concurrency = the
reference's 25-per-round fan-out, but scheduled by Spark) and yields
one event row per source conforming to ``PROBE_EVENT_SCHEMA``.

ffmpeg/ffprobe is NOT in this container, so the default prober is a
clearly-marked deterministic synthetic (seeded per url_id — stable
across runs and executors). A real deployment passes
``prober=ffprobe_prober`` (stub raising NotImplementedError here)
keeping every Spark-side contract — schema, fan-out, batch shape,
one-event-per-source — identical.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_test_spark.schemas import ERROR_CODES, RESOLUTION_MAP

# One probe outcome per source; field set mirrors PROBE_EVENT_SCHEMA
# minus created_time (stamped at emit, like StreamTest.cpp:296).
ProbeFn = Callable[[str, str], dict]

_PROTOCOLS = ["hls", "http", "rtmp", "rtsp", "udp"]
_VIDEO = ["h264", "hevc", "mpeg2video", "av1"]
_AUDIO = ["aac", "mp2", "ac3"]
_RESOLUTIONS = list(RESOLUTION_MAP.keys()) + ["0x0", ""]
_RATES = ["44100", "48000", "32000", ""]


def synthetic_prober(url_id: str, url: str) -> dict:
    """Deterministic fake probe: ~80% success with plausible metadata,
    ~20% an error code from the taxonomy (empty metadata — matching
    the reference, which only fills metadata it extracted before the
    failure). Seeded by url_id via crc32 (NOT Python ``hash()``, which
    is salted per process): stable across runs and executors."""
    import zlib

    h = zlib.crc32(f"probe:{url_id}".encode()) & 0x7FFFFFFF
    if h % 10 < 8:
        return {
            "item": 0,
            "return_value": "",
            "streaming_protocol": _PROTOCOLS[h % len(_PROTOCOLS)],
            "bitrate": f"{500 + h % 7500} kb/s",
            "stream_length": str(10 + h % 90),
            "video_format": _VIDEO[h % len(_VIDEO)],
            "video_resolution": _RESOLUTIONS[h % len(_RESOLUTIONS)],
            "audio_format": _AUDIO[h % len(_AUDIO)],
            "audio_sampling_rate": _RATES[h % len(_RATES)],
        }
    code = ERROR_CODES[h % len(ERROR_CODES)]
    return {
        "item": code,
        "return_value": str(-(h % 1000)),
        "streaming_protocol": "",
        "bitrate": "",
        "stream_length": "",
        "video_format": "",
        "video_resolution": "",
        "audio_format": "",
        "audio_sampling_rate": "",
    }


def ffprobe_prober(url_id: str, url: str) -> dict:  # pragma: no cover - stub
    """STUB for the real ffprobe-backed prober — ffmpeg is not
    installed in this environment. A production impl shells out to
    ffprobe with the reference's timeouts (5 s open / 10 s interrupt,
    StreamTest.cpp:1386-1392) and maps failures onto the error
    taxonomy."""
    raise NotImplementedError(
        "ffprobe not available here; inject synthetic_prober or a real prober"
    )


PROBE_RESULT_SCHEMA = (
    "url_id STRING, flow_address STRING, item INT, return_value STRING, "
    "lag_details STRING, streaming_protocol STRING, bitrate STRING, "
    "stream_length STRING, video_format STRING, video_resolution STRING, "
    "audio_format STRING, audio_sampling_rate STRING, "
    "created_time TIMESTAMP, target_matching_id STRING, target_matching STRING"
)


def probe_sources(
    sources: DataFrame,
    prober: ProbeFn = synthetic_prober,
    created_time: datetime | None = None,
) -> DataFrame:
    """Fan a sources dimension (id, url, target_matching,
    target_matching_id) out to probes; one outcome event per source.

    mapInPandas: the probe loop runs per Arrow batch on executors —
    the distributed replacement for the reference's fork()-per-source
    round scheduler (StreamTest.cpp:1083-1176). ``created_time``
    defaults to now(UTC), server-stamped like the reference; pass a
    fixed value for deterministic tests."""
    from stream_processing_test_spark.session import ensure_package_shipped

    ensure_package_shipped(sources.sparkSession)
    stamp = created_time or datetime.now(timezone.utc).replace(tzinfo=None)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [
                prober(str(u), str(url))
                for u, url in zip(pdf["id"], pdf["url"])
            ]
            out = pd.DataFrame(results)
            out.insert(0, "url_id", pdf["id"].astype(str).to_numpy())
            out.insert(1, "flow_address", pdf["url"].astype(str).to_numpy())
            out["lag_details"] = ""
            out["created_time"] = stamp
            out["target_matching_id"] = (
                pdf["target_matching_id"].astype(str).to_numpy()
            )
            out["target_matching"] = pdf["target_matching"].astype(str).to_numpy()
            cols = [c.split()[0] for c in PROBE_RESULT_SCHEMA.split(", ")]
            yield out[cols]

    return sources.mapInPandas(op, schema=PROBE_RESULT_SCHEMA)


from stream_processing_test_spark.registry import register  # noqa: E402
from stream_processing_test_spark.tables import load  # noqa: E402


@register(
    "probe_source_events", oracle=None, survey_ops="S4,S5,T1,F13", tier=0
)
def probe_source_events(spark, sf_dir: str) -> DataFrame:
    """S4 end-to-end: customer rows stand in for the source dimension
    (FIXTURES.md mapping), the synthetic prober emits one
    PROBE_EVENT_SCHEMA row each, and the result aggregates per error
    code — proving the connector's schema, fan-out and determinism.
    Rows-only driver check (probing is inherently non-SQL)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.concat(F.lit("http://stream/"), F.col("c_custkey")).alias("url"),
        F.col("c_name").alias("target_matching"),
        F.col("c_nationkey").cast("string").alias("target_matching_id"),
    )
    events = probe_sources(c, created_time=datetime(2024, 1, 15, 12, 0, 0))
    return (
        events.groupBy("item")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("video_resolution") != "", 1).otherwise(0)).alias(
                "n_with_resolution"
            ),
        )
        .orderBy("item")
    )
