"""Real media decoders (BMP / WAV) — byte-exact goldens.

The blobs are synthesized in-test with independent pure-Python
writers (struct packing straight from the public format specs), so
the numpy parsers in functions/multimodal.py are verified against a
second implementation, not against themselves.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.multimodal import (
    decode_bmp,
    decode_wav,
    extract_media_features,
)


def make_bmp(width: int, height: int, pixels) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (bottom-up rows).
    ``pixels[(r, c)] = (b, g, r)`` top-down coordinates."""
    stride = ((width * 3 + 3) // 4) * 4
    img = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up on disk
        line = bytearray()
        for col in range(width):
            b, g, r = pixels[(row, col)]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        img += line
    pixel_off = 14 + 40
    file_size = pixel_off + len(img)
    hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img),
        2835, 2835, 0, 0,
    )
    return bytes(hdr + info + img)


def make_wav(rate: int, channels: int, samples: list[int]) -> bytes:
    """Minimal 16-bit PCM WAV writer."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_bmp_golden_exact():
    # 3x2 image with known pixel values; mean over all BGR bytes
    px = {
        (0, 0): (10, 20, 30), (0, 1): (40, 50, 60), (0, 2): (70, 80, 90),
        (1, 0): (0, 0, 0), (1, 1): (255, 255, 255), (1, 2): (100, 110, 120),
    }
    blob = make_bmp(3, 2, px)
    w, h, mean, bpp = decode_bmp(blob)
    assert (w, h, bpp) == (3, 2, 24)
    want_mean = int(np.mean([v for t in px.values() for v in t]))
    assert mean == want_mean
    # stride correctness: 3px*3B = 9 → padded to 12; padding bytes
    # must NOT leak into the mean (they're zeros)
    assert mean > 0


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + b"\x00" * 60)
    good = make_bmp(2, 2, {(r, c): (1, 2, 3) for r in range(2) for c in range(2)})
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-4])
    # 8bpp header
    bad = bytearray(good)
    bad[28:30] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad))


def test_wav_golden_exact():
    samples = [0, 1000, -1000, 32767, -32768, 500]  # 2ch × 3 frames
    blob = make_wav(16000, 2, samples)
    rate, ch, frames, mean_abs = decode_wav(blob)
    assert (rate, ch, frames) == (16000, 2, 3)
    assert mean_abs == int(np.mean([abs(s) for s in samples]))


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"RIFX" + b"\x00" * 40)
    blob = make_wav(8000, 1, [1, 2, 3])
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(blob[:16])


def test_real_decode_through_spark_operator(spark):
    """End-to-end through the mapInPandas operator in REAL mode:
    BMP and WAV rows decode; a PNG-ish row errors per-row."""
    bmp = make_bmp(4, 3, {(r, c): (r, c, r + c) for r in range(3) for c in range(4)})
    wav = make_wav(8000, 1, [100, -100, 200, -200])
    rows = [
        (1, "image", bytearray(bmp)),
        (2, "audio", bytearray(wav)),
        (3, "image", bytearray(b"\x89PNG\r\n" + b"x" * 50)),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, blob binary")
    got = {
        r["media_id"]: r
        for r in extract_media_features(df).collect()
    }
    assert got[1]["error"] is None
    assert (got[1]["sample0"], got[1]["sample1"]) == (4, 3)  # w, h
    assert got[2]["error"] is None
    assert (got[2]["sample0"], got[2]["sample1"], got[2]["sample2"]) == (
        8000, 1, 4,
    )
    assert got[3]["error"] is not None
    assert "NotImplementedError" in got[3]["error"]
