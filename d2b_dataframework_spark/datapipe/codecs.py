"""Pure-stdlib media codecs: real PNG pixel decode and WAV PCM sample
decode with ZERO third-party dependencies.

This closes most of the "decode is stubbed" gap honestly: PNG is zlib
(stdlib) + per-scanline unfiltering, and WAV PCM is fixed-layout integer
frames — both fully decodable without Pillow/soundfile/ffmpeg. JPEG/MP4
entropy decode genuinely needs a codec library and stays out of scope
(their container METADATA is parsed in :mod:`.multimodal`).

Encoder twins exist so engine queries can synthesize real compressed
payloads executor-side and round-trip them through the independent
decode path; spec conformance of the filter math is additionally checked
against Pillow/soundfile in ``tests/test_codec_optional.py`` wherever
those optional dependencies are installed (importorskip — the
prophet-leg pattern).

Scope: PNG 8-bit, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the overwhelming majority of ML-pipeline
PNGs; WAV PCM 8-bit unsigned / 16-bit signed little-endian.
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 9.4): nearest of a/b/c to p = a+b-c,
    ties broken a, then b."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_scanline(
    ftype: int, line: bytearray, prior: bytes, bpp: int
) -> None:
    """Reconstruct one scanline in place from its filtered bytes.

    ``prior`` is the RECONSTRUCTED previous scanline (zeros for row 0).
    """
    n = len(line)
    if ftype == 0:  # None
        return
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
        return
    if ftype == 2:  # Up
        for i in range(n):
            line[i] = (line[i] + prior[i]) & 0xFF
        return
    if ftype == 3:  # Average
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
        return
    if ftype == 4:  # Paeth
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prior[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prior[i], c)) & 0xFF
        return
    raise ValueError(f"unknown PNG filter type {ftype}")


def decode_png(content: bytes) -> tuple[int, int, int, bytes] | None:
    """REAL PNG pixel decode: chunk walk -> zlib inflate of the IDAT
    stream -> per-scanline unfilter (all five filter types).

    Returns (width, height, channels, pixels) where ``pixels`` is
    ``height * width * channels`` reconstructed bytes in scanline order,
    or None when the payload is not a PNG this decoder supports (bad
    magic, bit depth != 8, palette / interlaced images, truncated or
    corrupt streams).
    """
    if content is None:
        return None
    b = bytes(content)
    if len(b) < 8 + 25 or not b.startswith(_PNG_MAGIC):
        return None
    pos = 8
    width = height = -1
    channels = 0
    idat = bytearray()
    seen_ihdr = False
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None  # truncated
        if ctype == b"IHDR":
            if length != 13:
                return None
            width, height = struct.unpack(">II", data[:8])
            bit_depth, color_type, _comp, _filt, interlace = data[8:13]
            if bit_depth != 8 or interlace != 0:
                return None
            channels = _PNG_CHANNELS.get(color_type, 0)
            if channels == 0:
                return None  # palette or invalid color type
            seen_ihdr = True
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if not seen_ihdr or not idat or width <= 0 or height <= 0:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) != height * (stride + 1):
        return None
    out = bytearray(height * stride)
    prior: bytes = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        try:
            _unfilter_scanline(ftype, line, prior, channels)
        except ValueError:
            return None
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return (width, height, channels, bytes(out))


def _filter_scanline(
    ftype: int, line: bytes, prior: bytes, bpp: int
) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    n = len(line)
    out = bytearray(n)
    if ftype == 0:
        return bytes(line)
    if ftype == 1:
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - a) & 0xFF
        return bytes(out)
    if ftype == 2:
        for i in range(n):
            out[i] = (line[i] - prior[i]) & 0xFF
        return bytes(out)
    if ftype == 3:
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - ((a + prior[i]) >> 1)) & 0xFF
        return bytes(out)
    if ftype == 4:
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prior[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - _paeth(a, prior[i], c)) & 0xFF
        return bytes(out)
    raise ValueError(f"unknown PNG filter type {ftype}")


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_for_row=None,
) -> bytes:
    """Write a real spec-conformant PNG (valid CRCs, zlib IDAT) from raw
    8-bit pixels in scanline order.

    ``filter_for_row(y) -> 0..4`` selects the per-scanline filter
    (default 0/None); queries cycle it so round-trips exercise every
    unfilter branch. ``channels`` must be 1/2/3/4 (gray, gray+alpha,
    RGB, RGBA).
    """
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixels length != height*width*channels")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prior: bytes = bytes(stride)
    for y in range(height):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        ftype = int(filter_for_row(y)) if filter_for_row else 0
        raw.append(ftype)
        raw.extend(_filter_scanline(ftype, line, prior, channels))
        prior = line
    idat = zlib.compress(bytes(raw), 6)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV PCM
# ---------------------------------------------------------------------------


def decode_wav(content: bytes) -> tuple[int, int, int, list[int]] | None:
    """REAL WAV PCM sample decode: RIFF chunk walk -> fmt layout ->
    integer frames from the data chunk.

    Returns (sample_rate, channels, bit_depth, samples) with samples as
    signed ints in interleaved frame order (8-bit unsigned PCM is
    re-centered to signed by subtracting 128, the spec convention), or
    None for non-PCM / unsupported depth / malformed payloads.
    """
    if content is None:
        return None
    b = bytes(content)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = depth = 0
    data: bytes | None = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + length]
        if ctype == b"fmt " and len(body) >= 16:
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            depth = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:  # PCM only
                return None
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if data is None or rate <= 0 or channels <= 0:
        return None
    if depth == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    elif depth == 8:
        samples = [x - 128 for x in data]
    else:
        return None
    return (rate, channels, depth, samples)


def encode_wav(
    rate: int, channels: int, depth: int, samples: list[int]
) -> bytes:
    """Write a real PCM WAV (RIFF/fmt/data) from interleaved integer
    samples; depth 16 (signed LE) or 8 (unsigned, +128 bias)."""
    if depth == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif depth == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError("depth must be 8 or 16")
    block_align = channels * (depth // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align,
                      block_align, depth)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
