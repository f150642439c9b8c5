"""12-bit JPEG (extended sequential DCT, SOF1) goldens vs an
INDEPENDENT in-test encoder.

T.81 B.2.2 allows 12-bit sample precision for the extended
sequential and progressive DCT processes (not baseline SOF0):
level shift becomes 2048, quantizer entries are 16-bit (DQT Pq=1),
DC difference categories extend to 16 and AC sizes to 14, and
reconstruction clamps to [0, 4095].  The encoder below is built from
the spec like ``tests/test_jpeg_real.py``'s 8-bit one (own forward
DCT basis, canonical-Huffman tables sized for the 12-bit code
alphabet) so the decoder is checked against a second implementation.
Loss happens only at the encoder's quantization step, so the decode
is compared byte-exactly (|diff| ≤ 1 float-rounding ties) against
the test's OWN reconstruction of its quantized coefficients.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_pixels,
    decode_jpeg_pixels_native,
    idct2,
)
from tests.test_jpeg_real import _BitWriter, _canonical_codes, _size

# 16-bit quantizer for 12-bit samples: 4× the Annex-K luma table
# (values up to 484 — exercises the Pq=1 parse; keeps every quantized
# AC coefficient within the 14-bit category limit: |DCT| ≤ 8·4095).
QT12 = 4 * np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

# Flat canonical tables covering the FULL 12-bit alphabets: DC
# categories 0..16 all at code length 5 (17 ≤ 2^5, last code 10000b —
# the reserved all-ones code stays unused), AC (run,size) for
# run 0..15 × size 1..14 plus EOB and ZRL all at length 8 (226 ≤ 2^8).
DC12_SYMS = list(range(17))
DC12_COUNTS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
AC12_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]
AC12_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(AC12_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]


def _fdct(block):
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[u, v] = cu * cv / 4 * s
    return out


def _encode_block12(bw, block, dc_codes, ac_codes, pred):
    """Encode one level-shifted 8×8 block; returns (qblock, new pred)."""
    q = np.round(_fdct(block - 2048.0) / QT12).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _size(diff)
    ln, code = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _size(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]
        bw.write(code, ln)
    return q, int(zz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _pad_blocks(pixels):
    h, w = pixels.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    img = np.zeros((ph, pw))
    img[:h, :w] = pixels
    img[h:, :w] = pixels[-1:, :w]
    img[:, w:] = img[:, w - 1:w]
    return img, ph, pw


def encode_jpeg12_gray(pixels: np.ndarray):
    """Independent 12-bit extended-sequential encoder (grayscale).
    Returns (jpeg_bytes, quantized_blocks, (padded_h, padded_w))."""
    h, w = pixels.shape
    dc_codes = _canonical_codes(DC12_COUNTS, DC12_SYMS)
    ac_codes = _canonical_codes(AC12_COUNTS, AC12_SYMS)
    img, ph, pw = _pad_blocks(pixels)
    bw = _BitWriter()
    pred = 0
    qblocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            q, pred = _encode_block12(
                bw, img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                dc_codes, ac_codes, pred,
            )
            qblocks.append(q)
    bw.flush()
    dqt = _seg(0xDB, b"\x10" + QT12.reshape(-1)[ZIGZAG]
               .astype(">u2").tobytes())
    sof = _seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(DC12_COUNTS) + bytes(DC12_SYMS)
        + bytes([0x10]) + bytes(AC12_COUNTS) + bytes(AC12_SYMS),
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9",
        qblocks, (ph, pw),
    )


def encode_jpeg12_color444(rgb: np.ndarray):
    """Independent 12-bit 4:4:4 color encoder (one shared table set)."""
    h, w, _ = rgb.shape
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0
    dc_codes = _canonical_codes(DC12_COUNTS, DC12_SYMS)
    ac_codes = _canonical_codes(AC12_COUNTS, AC12_SYMS)
    planes = [np.clip(p, 0, 4095) for p in (y, cb, cr)]
    padded = [_pad_blocks(p) for p in planes]
    ph, pw = padded[0][1], padded[0][2]
    bw = _BitWriter()
    preds = [0, 0, 0]
    qblocks = [[], [], []]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(3):  # 4:4:4 MCU: one block per component
                q, preds[ci] = _encode_block12(
                    bw, padded[ci][0][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    dc_codes, ac_codes, preds[ci],
                )
                qblocks[ci].append(q)
    bw.flush()
    dqt = _seg(0xDB, b"\x10" + QT12.reshape(-1)[ZIGZAG]
               .astype(">u2").tobytes())
    sof = _seg(0xC1, struct.pack(">BHHB", 12, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(DC12_COUNTS) + bytes(DC12_SYMS)
        + bytes([0x10]) + bytes(AC12_COUNTS) + bytes(AC12_SYMS),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9",
        qblocks, (ph, pw),
    )


def _reconstruct_gray12(qblocks, ph, pw, h, w):
    img = np.zeros((ph, pw))
    i = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                idct2(qblocks[i] * QT12) + 2048.0
            )
            i += 1
    return np.clip(np.round(img), 0, 4095).astype(np.uint16)[:h, :w]


def test_jpeg12_gray_smooth():
    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    px = ((yy * 97 + xx * 61) % 3200 + 400).astype(np.float64)
    blob, qblocks, (ph, pw) = encode_jpeg12_gray(px)
    got = decode_jpeg_pixels_native(blob)
    assert got.shape == (h, w, 1) and got.dtype == np.uint16
    ref = _reconstruct_gray12(qblocks, ph, pw, h, w)
    diff = np.abs(got[..., 0].astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # lossy round-trip stays near the 12-bit source for smooth input
    assert np.abs(got[..., 0].astype(int) - px.astype(int)).mean() < 100


def test_jpeg12_gray_random_exact_entropy_inversion():
    """Full-range 12-bit noise drives large AC categories (sizes the
    8-bit alphabet never reaches) and ZRL/EOB interplay."""
    rng = np.random.default_rng(29)
    px = rng.integers(0, 4096, size=(24, 16)).astype(np.float64)
    blob, qblocks, (ph, pw) = encode_jpeg12_gray(px)
    got = decode_jpeg_pixels_native(blob)
    ref = _reconstruct_gray12(qblocks, ph, pw, 24, 16)
    diff = np.abs(got[..., 0].astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_jpeg12_color444_centering():
    """Chroma must be centred at 2048 (not 128): a uniform mid-gray
    block plus colored quadrants decodes to the right hues."""
    h, w = 16, 16
    rgb = np.zeros((h, w, 3))
    rgb[:8, :8] = (3500, 400, 400)    # red-ish quadrant
    rgb[:8, 8:] = (400, 3500, 400)    # green-ish
    rgb[8:, :8] = (400, 400, 3500)    # blue-ish
    rgb[8:, 8:] = (2000, 2000, 2000)  # neutral gray
    blob, qblocks, (ph, pw) = encode_jpeg12_color444(rgb)
    got = decode_jpeg_pixels_native(blob)
    assert got.shape == (h, w, 3) and got.dtype == np.uint16
    # hue ordering survives the lossy trip in each quadrant
    q = got.astype(int)
    assert q[2:6, 2:6, 0].mean() > q[2:6, 2:6, 1].mean() + 800
    assert q[2:6, 10:14, 1].mean() > q[2:6, 10:14, 0].mean() + 800
    assert q[10:14, 2:6, 2].mean() > q[10:14, 2:6, 0].mean() + 800
    neutral = q[10:14, 10:14]
    assert abs(neutral[..., 0].mean() - neutral[..., 1].mean()) < 200
    # and the 8-bit contract is exactly the native >> 4
    scaled = decode_jpeg_pixels(blob)
    assert scaled.dtype == np.uint8
    assert np.array_equal(scaled, (got >> 4).astype(np.uint8))


def test_jpeg12_summary_reports_12_bits():
    px = np.full((8, 8), 2080.0)
    blob, _, _ = encode_jpeg12_gray(px)
    w, h, mean, bits = decode_jpeg(blob)
    assert (w, h, bits) == (8, 8, 12)
    assert abs(mean - 130) <= 2  # 2080 >> 4 = 130 on the 8-bit scale


def test_jpeg12_rejections():
    px = np.full((8, 8), 1000.0)
    blob, _, _ = encode_jpeg12_gray(px)
    # 12-bit relabeled as BASELINE SOF0 must be rejected loudly
    base = bytearray(blob)
    idx = blob.find(b"\xff\xc1")
    base[idx + 1] = 0xC0
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(base))
    # invalid DQT precision field
    bad = bytearray(blob)
    didx = blob.find(b"\xff\xdb")
    bad[didx + 4] = 0x20
    with pytest.raises(ValueError, match="DQT"):
        decode_jpeg(bytes(bad))
