"""Probe-source connector tests (S4): schema conformance, determinism,
one-event-per-source, pluggable prober."""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stream_processing_test_spark.schemas import ERROR_CODES
from stream_processing_test_spark.sources.probe import (
    ffprobe_prober,
    probe_sources,
    synthetic_prober,
)

STAMP = datetime(2024, 1, 15, 12, 0, 0)


def _sources(spark, n=40):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [str(i) for i in range(n)],
                "url": [f"http://stream/{i}" for i in range(n)],
                "target_matching": [f"prog {i % 5}" for i in range(n)],
                "target_matching_id": [str(i % 5) for i in range(n)],
            }
        ),
        "id STRING, url STRING, target_matching STRING, target_matching_id STRING",
    )


def test_one_event_per_source_and_schema(spark):
    src = _sources(spark)
    ev = probe_sources(src, created_time=STAMP)
    rows = ev.collect()
    assert len(rows) == 40  # exactly one outcome event per source
    assert ev.columns[:3] == ["url_id", "flow_address", "item"]
    for r in rows:
        assert r["item"] == 0 or r["item"] in ERROR_CODES
        assert r["created_time"] == STAMP
        if r["item"] != 0:
            assert r["video_format"] == ""  # errors carry no metadata


def test_probe_deterministic_across_runs(spark):
    src = _sources(spark)
    a = sorted(map(tuple, probe_sources(src, created_time=STAMP).collect()))
    b = sorted(map(tuple, probe_sources(src, created_time=STAMP).collect()))
    assert a == b


def test_custom_prober_injection(spark):
    def always_timeout(url_id: str, url: str) -> dict:
        return {
            "item": 1012,
            "return_value": "-110",
            "streaming_protocol": "",
            "bitrate": "",
            "stream_length": "",
            "video_format": "",
            "video_resolution": "",
            "audio_format": "",
            "audio_sampling_rate": "",
        }

    out = probe_sources(_sources(spark, 5), prober=always_timeout, created_time=STAMP)
    assert [r["item"] for r in out.collect()] == [1012] * 5


def test_ffprobe_gated_on_binary():
    """Without an ffprobe binary the real prober refuses loudly at call
    time (inject synthetic_prober instead); with one present it probes
    a bogus URL and maps the failure onto the error taxonomy."""
    from stream_processing_test_spark.sources.probe import ffprobe_available

    if not ffprobe_available():
        with pytest.raises(RuntimeError):
            ffprobe_prober("1", "http://x")
    else:
        out = ffprobe_prober("1", "http://127.0.0.1:1/does-not-exist")
        assert out["item"] in ERROR_CODES and out["item"] != 0


def test_synthetic_prober_mixes_outcomes():
    outcomes = {synthetic_prober(str(i), f"u{i}")["item"] for i in range(200)}
    assert 0 in outcomes and any(c != 0 for c in outcomes)


def test_wedged_probe_terminates_within_grace(spark):
    """T7: a prober that ignores its own timeouts (sleeps 60 s) must
    not wedge the batch — the per-probe watchdog emits STREAM_TIMEOUT
    (1012) and the whole 8-source batch finishes in a few seconds."""
    import time

    def hanging_prober(url_id: str, url: str) -> dict:
        time.sleep(60)
        return synthetic_prober(url_id, url)

    t0 = time.time()
    rows = probe_sources(
        _sources(spark, n=8).coalesce(1),
        prober=hanging_prober,
        created_time=STAMP,
        probe_timeout_s=0.3,
    ).collect()
    assert time.time() - t0 < 30  # nowhere near 8 x 60 s
    assert len(rows) == 8
    assert all(r["item"] == 1012 and r["return_value"] == "wedged" for r in rows)


def test_stop_flag_cancels_remaining_probes(spark, tmp_path):
    """T7: once the (file-backed, executor-visible) stop flag is set,
    remaining sources emit cancelled events and the prober is never
    invoked — mirroring the reference's shared-mmap flag
    (StreamTest.cpp:807-815, 1121)."""
    import os

    flag = str(tmp_path / "stop")
    calls = str(tmp_path / "calls")
    os.mkdir(calls)

    def counting_prober(url_id: str, url: str) -> dict:
        open(os.path.join(calls, url_id), "w").close()
        return synthetic_prober(url_id, url)

    open(flag, "w").close()  # flag already set: everything cancels
    rows = probe_sources(
        _sources(spark, n=12),
        prober=counting_prober,
        created_time=STAMP,
        stop=lambda: os.path.exists(flag),
    ).collect()
    assert len(rows) == 12
    assert all(r["item"] == 1012 and r["return_value"] == "cancelled" for r in rows)
    assert os.listdir(calls) == []  # prober never ran after the flag


def test_kill_escalation_reaps_term_ignoring_child():
    """T7: _communicate_with_escalation must TERM, wait the grace, then
    KILL a child that traps SIGTERM — and reap it well under the
    child's natural runtime (the reference's 5 s escalation,
    StreamTest.cpp:1131-1167)."""
    import subprocess
    import time

    from stream_processing_test_spark.sources.probe import (
        _communicate_with_escalation,
    )

    proc = subprocess.Popen(
        ["bash", "-c", 'trap "" TERM; sleep 60'],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    t0 = time.time()
    out = _communicate_with_escalation(proc, total_timeout_s=0.3, kill_grace_s=0.5)
    assert out is None  # timed out -> killed
    assert proc.returncode is not None  # actually reaped
    assert time.time() - t0 < 10
