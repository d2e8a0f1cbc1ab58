"""Pure-stdlib media codecs for the multimodal operators.

The container has no PIL/ffmpeg/torchaudio, but "decode the payload"
does not require them for the formats that matter to tests and to a
surprising share of real corpora:

- **PNG**: full decode (8-bit depth, gray / gray+alpha / RGB / RGBA,
  non-interlaced) — chunk walk, zlib inflate, per-row unfiltering
  (None/Sub/Up/Average/Paeth per the PNG spec) — and a matching
  encoder (filter-0 rows, zlib deflate) used by the resize stage.
- **JPEG / GIF / BMP**: header-only dimension parsing (SOF scan for
  JPEG, fixed offsets for GIF/BMP).
- **WAV**: RIFF chunk walk + 16-bit PCM sample decode.

Everything is deterministic (no float RNG, explicit rounding), so the
multimodal operators keep the same replayability contract as the rest
of the engine. Payloads that sniff as none of these formats fall back
to the caller's stub kernel — the honest path for synthetic corpora
and for codecs that genuinely need native libraries (video frames).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str | None:
    """Identify the container format from magic bytes."""
    if payload.startswith(PNG_SIG):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunks(payload: bytes):
    pos = len(PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Decode an 8-bit non-interlaced PNG to raw samples.

    Returns ``(width, height, channels, pixels)`` with ``pixels`` a
    row-major bytearray of ``width*height*channels`` samples."""
    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    width = height = channels = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace}); 8-bit non-interlaced only"
                )
            if width == 0 or height == 0:
                raise ValueError("PNG with zero dimension")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = bytearray(height * stride)
    prev_row_start = -1
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        row = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        for x in range(stride):
            v = row[x]
            a = out[o + x - channels] if x >= channels else 0
            b = out[prev_row_start + x] if y > 0 else 0
            c = (
                out[prev_row_start + x - channels]
                if (y > 0 and x >= channels)
                else 0
            )
            if fbyte == 0:
                pass
            elif fbyte == 1:
                v = (v + a) & 0xFF
            elif fbyte == 2:
                v = (v + b) & 0xFF
            elif fbyte == 3:
                v = (v + (a + b) // 2) & 0xFF
            elif fbyte == 4:
                v = (v + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad PNG filter {fbyte}")
            out[o + x] = v
        prev_row_start = o
    return width, height, channels, out


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw 8-bit samples as a PNG (filter 0 rows)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, rw: int, rh: int
) -> bytes:
    """Nearest-neighbor resample of a raw sample buffer."""
    out = bytearray(rw * rh * channels)
    for y in range(rh):
        sy = y * height // rh
        src_row = sy * width * channels
        dst_row = y * rw * channels
        for x in range(rw):
            sx = x * width // rw
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


# ---------------------------------------------------------------------------
# Header-only dimension parsers
# ---------------------------------------------------------------------------


def jpeg_size(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker of a JPEG stream.

    Spec-conformant marker walk: consecutive 0xFF bytes are fill
    (B.1.1.2) and are consumed before interpreting the marker byte;
    0xFF00 is a stuffed data byte, not a marker; the walk stops at
    EOI (0xD9) and at SOS (0xDA) — SOF precedes SOS in any decodable
    stream, and past SOS lies entropy-coded data where segment
    lengths are meaningless."""
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # consume 0xFF fill bytes before the marker byte
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break
        marker = payload[pos + 1]
        if marker == 0x00:  # stuffed byte, not a marker
            pos += 2
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length field
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no SOF is coming
            break
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seglen < 2:
            raise ValueError("bad JPEG segment length")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                break
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("no JPEG SOF marker found")


def gif_size(payload: bytes) -> tuple[int, int]:
    w, h = struct.unpack("<HH", payload[6:10])
    return w, h


def bmp_size(payload: bytes) -> tuple[int, int]:
    w, h = struct.unpack("<ii", payload[18:26])
    return w, abs(h)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE stream; decode 16-bit PCM samples when present.

    Returns ``channels / sample_rate / n_samples / duration_s`` plus
    ``samples`` (list of ints, first channel) for PCM-16 payloads."""
    pos = 12
    fmt = None
    data = b""
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
    samples: list[int] = []
    if audio_fmt == 1 and bits == 16 and block_align:
        frames = len(data) // block_align
        for i in range(frames):
            (s,) = struct.unpack_from("<h", data, i * block_align)
            samples.append(s)
    n_samples = len(data) // block_align if block_align else 0
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_samples": n_samples,
        "duration_s": round(n_samples / rate, 6) if rate else 0.0,
        "samples": samples,
    }
