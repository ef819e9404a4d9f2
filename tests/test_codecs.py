"""Pure-codec tests: PNG decode (zlib + all five unfilter branches) and
WAV PCM decode, no Spark session needed."""

from __future__ import annotations

import struct
import zlib

import pytest

from d2b_dataframework_spark.datapipe.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from d2b_dataframework_spark.datapipe.multimodal import parse_image_dimensions


def _pixels(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    return bytes(
        (seed + 7 * y + 3 * x + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(ch, ftype):
    w, h = 5, 4
    px = _pixels(w, h, ch, seed=ftype * 13)
    blob = encode_png(w, h, ch, px, filter_for_row=lambda y: ftype)
    decoded = decode_png(blob)
    assert decoded == (w, h, ch, px)


def test_png_mixed_filters_roundtrip():
    w, h, ch = 9, 11, 3
    px = _pixels(w, h, ch, seed=99)
    blob = encode_png(w, h, ch, px, filter_for_row=lambda y: y % 5)
    assert decode_png(blob) == (w, h, ch, px)


def test_png_decode_known_bytes():
    """Hand-assembled 2x1 grayscale PNG with filter 0 — decode without
    going through our own encoder (independent of encoder bugs)."""
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    raw = b"\x00\x10\xfe"  # filter 0, pixels 0x10 0xFE

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(blob)
    assert (w, h, ch, px) == (2, 1, 1, b"\x10\xfe")
    # and the container-metadata parser agrees
    assert parse_image_dimensions(blob) == ("png", 2, 1)


def test_png_rejects_unsupported():
    assert decode_png(None) is None
    assert decode_png(b"not a png") is None
    # palette (color type 3) is out of scope -> None, not garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    assert decode_png(blob) is None
    # truncated IDAT -> None
    good = encode_png(4, 4, 3, _pixels(4, 4, 3))
    assert decode_png(good[:-20]) is None


def test_wav_roundtrip_16bit_stereo():
    samples = [((i * 37) % 65536) - 32768 for i in range(64)]
    blob = encode_wav(16_000, 2, 16, samples)
    assert decode_wav(blob) == (16_000, 2, 16, samples)


def test_wav_roundtrip_8bit_mono_odd_length():
    samples = [(i % 256) - 128 for i in range(33)]  # odd byte count -> pad
    blob = encode_wav(8_000, 1, 8, samples)
    assert decode_wav(blob) == (8_000, 1, 8, samples)


def test_wav_rejects_non_pcm():
    samples = [0, 1, -1]
    blob = bytearray(encode_wav(44_100, 1, 16, samples))
    # flip the audio-format field (offset: RIFF(12) + 'fmt '(4) + len(4))
    blob[20:22] = struct.pack("<H", 3)  # IEEE float
    assert decode_wav(bytes(blob)) is None
    assert decode_wav(b"RIFFxxxxWAVE") is None
    assert decode_wav(None) is None


def test_jpeg_fill_bytes_before_marker():
    """Legal 0xFF padding before a marker must not desynchronize the
    SOFn walk (regression for the marker-walk fix)."""
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 3)
    blob = b"\xff\xd8" + b"\xff\xff\xff" + sof0 + b"\xff\xd9" + b"\x00" * 8
    assert parse_image_dimensions(blob) == ("jpeg", 640, 480)


def test_jpeg_sos_stops_walk():
    """SOS before any SOF ends the scan (entropy data follows) instead
    of reading bogus lengths out of compressed bytes."""
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x00\x00\x00\x00\x00"
    blob = b"\xff\xd8" + sos + b"\xff\x00garbage" + b"\x00" * 8
    assert parse_image_dimensions(blob) is None


def test_gif_and_bmp_dimensions():
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 6
    assert parse_image_dimensions(gif) == ("gif", 320, 200)
    bmp = (
        b"BM" + b"\x00" * 16
        + (640).to_bytes(4, "little", signed=True)
        + (-480).to_bytes(4, "little", signed=True)  # top-down rows
        + b"\x00" * 8
    )
    assert parse_image_dimensions(bmp) == ("bmp", 640, 480)
    assert parse_image_dimensions(b"GIF89") is None
