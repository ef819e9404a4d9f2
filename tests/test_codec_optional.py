"""Optional-dependency conformance legs for the pure-stdlib codecs
(the prophet-leg pattern, VERDICT r3 item #4): where Pillow/soundfile
exist, cross-check our PNG/WAV decode against the reference codec; where
they don't, SKIP visibly (never silently pass)."""

from __future__ import annotations

import io

import pytest

from d2b_dataframework_spark.datapipe.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _pixels(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    return bytes(
        (seed + 7 * y + 3 * x + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("ch,mode", [(1, "L"), (3, "RGB"), (4, "RGBA")])
def test_png_matches_pillow(ch, mode):
    """Our encoder's output decodes identically under Pillow, and
    Pillow's own PNG output decodes identically under our decoder —
    spec conformance both directions, beyond encoder/decoder mirroring."""
    Image = pytest.importorskip("PIL.Image")
    w, h = 7, 5
    px = _pixels(w, h, ch, seed=3)
    ours = encode_png(w, h, ch, px, filter_for_row=lambda y: y % 5)
    img = Image.open(io.BytesIO(ours))
    assert img.size == (w, h) and img.mode == mode
    assert img.tobytes() == px
    # reverse direction: Pillow-written PNG through our decoder
    buf = io.BytesIO()
    Image.frombytes(mode, (w, h), px).save(buf, format="PNG")
    decoded = decode_png(buf.getvalue())
    assert decoded == (w, h, ch, px)


def test_wav_matches_soundfile():
    sf = pytest.importorskip("soundfile")
    np = pytest.importorskip("numpy")
    samples = [((i * 251) % 65536) - 32768 for i in range(96)]
    ours = encode_wav(16_000, 2, 16, samples)
    data, rate = sf.read(io.BytesIO(ours), dtype="int16")
    assert rate == 16_000
    assert data.reshape(-1).tolist() == samples
    # reverse: soundfile-written WAV through our decoder
    buf = io.BytesIO()
    sf.write(buf, np.array(samples, dtype="int16").reshape(-1, 2), 16_000,
             format="WAV", subtype="PCM_16")
    assert decode_wav(buf.getvalue()) == (16_000, 2, 16, samples)
