"""Real-codec tests: the pure-stdlib PNG/WAV/JPEG/GIF/BMP layer and
the multimodal decode kernel that dispatches onto it, plus the pinned
contract for probe_source_events (the connector's rows-only driver
check gets its correctness evidence here)."""

from __future__ import annotations

import io
import struct
import sys
import wave
import zlib
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stream_processing_test_spark.llm import codecs
from stream_processing_test_spark.llm.multimodal import (
    _image_features,
    decode_payload,
)


def _make_pixels(w, h, ch, seed=3):
    # deterministic pseudo-random samples, no numpy needed
    out = bytearray()
    x = seed
    for _ in range(w * h * ch):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def test_png_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        w, h = 13, 7
        px = _make_pixels(w, h, ch)
        blob = codecs.encode_png(w, h, ch, px)
        assert codecs.sniff(blob) == "png"
        gw, gh, gch, gpx = codecs.decode_png(blob)
        assert (gw, gh, gch) == (w, h, ch)
        assert bytes(gpx) == px


def test_png_unfilters_every_filter_type():
    """Hand-build a PNG whose rows use filters 1-4 (Sub/Up/Average/
    Paeth), applying each filter FORWARD here per the spec; decode_png
    must invert them back to the original samples."""
    w, h, ch = 6, 4, 3
    px = _make_pixels(w, h, ch, seed=9)
    stride = w * ch

    def row(y):
        return px[y * stride : (y + 1) * stride]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    filters = [1, 2, 3, 4]
    for y in range(h):
        f = filters[y % 4]
        raw.append(f)
        cur, up = row(y), (row(y - 1) if y > 0 else bytes(stride))
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = up[x]
            c = up[x - ch] if x >= ch else 0
            if f == 1:
                raw.append((cur[x] - a) & 0xFF)
            elif f == 2:
                raw.append((cur[x] - b) & 0xFF)
            elif f == 3:
                raw.append((cur[x] - (a + b) // 2) & 0xFF)
            else:
                raw.append((cur[x] - paeth(a, b, c)) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )
    gw, gh, gch, gpx = codecs.decode_png(blob)
    assert (gw, gh, gch) == (w, h, ch) and bytes(gpx) == px


def test_resize_nearest_exact_indexing():
    w, h, ch = 4, 2, 1
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    out = codecs.resize_nearest(w, h, ch, px, 2, 1)
    # nearest: x->x*4//2, y->y*2//1 -> pixels (0,0) and (2,0)
    assert out == bytes([10, 30])


def test_header_parsers():
    # minimal JPEG: SOI + SOF0 (h=48, w=32)
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 48, 32) + b"\x01\x01\x11\x00"
    jpg = b"\xff\xd8" + sof + b"\xff\xd9"
    assert codecs.sniff(jpg) == "jpeg"
    assert codecs.jpeg_size(jpg) == (32, 48)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert codecs.sniff(gif) == "gif"
    assert codecs.gif_size(gif) == (320, 200)

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -128) + b"\x00" * 8
    assert codecs.sniff(bmp) == "bmp"
    assert codecs.bmp_size(bmp) == (64, 128)  # negative height = top-down


def test_jpeg_fill_bytes_and_eoi():
    """Spec-valid padding: consecutive 0xFF fill bytes before a marker
    must be consumed, not parsed as a segment length (B.1.1.2); a
    stream ending at EOI without SOF must raise, not walk past the
    end."""
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 48, 32)
        + b"\x01\x01\x11\x00"
    )
    # fill bytes between SOI and SOF: FF FF FF C0 ...
    padded = b"\xff\xd8" + b"\xff\xff" + sof + b"\xff\xd9"
    assert codecs.jpeg_size(padded) == (32, 48)
    # APP0 segment, then fill bytes, then SOF
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    padded2 = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof + b"\xff\xd9"
    assert codecs.jpeg_size(padded2) == (32, 48)
    # EOI before any SOF: must raise (not return garbage)
    with pytest.raises(ValueError):
        codecs.jpeg_size(b"\xff\xd8" + app0 + b"\xff\xd9" + sof)
    # SOS before SOF (undecodable stream): stop, raise
    sos = b"\xff\xda" + struct.pack(">H", 2)
    with pytest.raises(ValueError):
        codecs.jpeg_size(b"\xff\xd8" + sos + sof)


def test_zero_dimension_headers_fall_back_to_stub():
    """Degenerate dimensions (width or height 0) must route to the
    stub fallback — never a ZeroDivisionError that kills the whole
    mapInPandas task ('bad files are data, not bugs')."""
    # PNG declaring 0x0 in IHDR
    ihdr = struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0)
    png0 = (
        codecs.PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", 0)
    )
    with pytest.raises(ValueError):
        codecs.decode_png(png0)
    d = decode_payload(png0)
    assert d["width"] > 0 and d["height"] > 0  # stub dims
    # GIF declaring width 0
    gif0 = b"GIF89a" + struct.pack("<HH", 0, 200) + b"\x00" * 6
    assert codecs.gif_size(gif0) == (0, 200)
    d = decode_payload(gif0)
    assert d["width"] > 0 and d["height"] > 0
    # BMP declaring height 0
    bmp0 = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, 0) + b"\x00" * 8
    d = decode_payload(bmp0)
    assert d["width"] > 0 and d["height"] > 0
    # and the resize stage passes degenerate metadata through untouched
    from stream_processing_test_spark.llm.multimodal import _resize_one

    w, h, rw, rh, payload = _resize_one(gif0, 224)
    assert (rw, rh) == (w, h) and payload  # stub dims, no crash


def _make_wav(rate=8000, samples=(0, 1000, -1000, 32767, -32768)):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_wav_decode():
    blob = _make_wav()
    assert codecs.sniff(blob) == "wav"
    meta = codecs.decode_wav(blob)
    assert meta["channels"] == 1
    assert meta["sample_rate"] == 8000
    assert meta["samples"] == [0, 1000, -1000, 32767, -32768]
    assert meta["duration_s"] == round(5 / 8000, 6)


def test_decode_payload_dispatch_and_fallback():
    # real PNG -> real dimensions and channel-mean features
    w, h, ch = 10, 5, 3
    solid = bytes([100, 150, 200] * (w * h))
    png = codecs.encode_png(w, h, ch, solid)
    d = decode_payload(png)
    assert (d["width"], d["height"]) == (w, h)
    assert d["features"][:3] == [
        round(100 / 255, 6),
        round(150 / 255, 6),
        round(200 / 255, 6),
    ]
    assert d["features"] == _image_features(w, h, ch, solid)

    # WAV -> sample-rate/channel conventions
    d = decode_payload(_make_wav())
    assert (d["width"], d["height"]) == (8000, 1)

    # unknown bytes -> deterministic stub
    text = b"plain text payload, not media"
    d1, d2 = decode_payload(text), decode_payload(text)
    assert d1 == d2 and len(d1["features"]) == 8

    # sniffs-as-PNG but corrupt -> stub fallback, not an exception
    corrupt = codecs.PNG_SIG + b"\x00" * 10
    assert decode_payload(corrupt) == decode_payload(corrupt)


def test_resize_real_png_payload_roundtrip(spark):
    """resize_images on a real PNG must emit a decodable PNG of the
    target geometry whose pixels are the exact nearest-neighbor
    resample of the source."""
    from stream_processing_test_spark.llm.multimodal import resize_images

    w, h, ch = 64, 32, 3
    px = _make_pixels(w, h, ch, seed=5)
    blob = codecs.encode_png(w, h, ch, px)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "media_type": ["image"], "payload": [bytearray(blob)]}
        )
    )
    row = resize_images(media, target=16).collect()[0]
    # shorter side (32) -> 16, aspect kept: 32x16
    assert (row["width"], row["height"]) == (w, h)
    assert (row["resized_width"], row["resized_height"]) == (32, 16)
    rw, rh, rch, rpx = codecs.decode_png(bytes(row["payload"]))
    assert (rw, rh, rch) == (32, 16, ch)
    assert bytes(rpx) == codecs.resize_nearest(w, h, ch, px, 32, 16)


def test_extract_features_real_and_stub_mixed(spark):
    """One Arrow batch mixing a real PNG, a real WAV and opaque text
    must decode each with the right kernel — the production shape where
    corpora are format-heterogeneous."""
    from stream_processing_test_spark.llm.multimodal import extract_features

    png = codecs.encode_png(4, 4, 1, bytes(range(16)))
    wav = _make_wav()
    txt = b"just text"
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "media_type": ["image", "audio", "text"],
                "payload": [bytearray(png), bytearray(wav), bytearray(txt)],
            }
        )
    )
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (4, 4)
    assert (rows[2]["width"], rows[2]["height"]) == (8000, 1)
    assert rows[3]["n_bytes"] == len(txt)
    for r in rows.values():
        assert len(r["features"]) == 8


def test_probe_source_events_pinned_contract(spark):
    """Pinned contract for the connector query (now ALSO oracle-checked
    — the synthetic prober seeds from the portable hash, so DuckDB
    replays it): exact per-error-code event counts at sf0.001. Any
    change to the connector's fan-out, schema or outcome mixing shows
    up as a diff here."""
    from stream_processing_test_spark.registry import all_queries

    df = all_queries()["probe_source_events"].fn(spark, "/root/testdata/sf0.001")
    assert df.schema.simpleString() == (
        "struct<item:int,n_events:bigint,n_with_resolution:bigint>"
    )
    got = [(r["item"], r["n_events"], r["n_with_resolution"]) for r in df.collect()]
    assert got == [
        (0, 128, 123),
        (1001, 3, 0),
        (1002, 2, 0),
        (1003, 1, 0),
        (1004, 2, 0),
        (1005, 2, 0),
        (1006, 4, 0),
        (1007, 1, 0),
        (1009, 1, 0),
        (1011, 1, 0),
        (1012, 3, 0),
        (1013, 1, 0),
        (1014, 1, 0),
    ]
    assert sum(n for _, n, _ in got) == 150  # one event per source, total


def test_corrupt_idat_deflate_falls_back_to_stub():
    """A structurally valid PNG whose IDAT payload is NOT a deflate
    stream raises zlib.error inside decode_png — which is not a
    ValueError, so it must be caught explicitly by decode_payload's
    fallback net (a corrupt compressed body is data, not a bug)."""
    import struct
    import zlib

    import pytest

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    blob = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", b"\xff\xfe not deflate \x00\x01")
        + codecs._png_chunk(b"IEND", b"")
    )
    with pytest.raises(zlib.error):
        codecs.decode_png(blob)  # the codec itself stays loud
    d = decode_payload(blob)  # the pipeline kernel degrades to stub
    assert d == decode_payload(blob) and len(d["features"]) == 8
