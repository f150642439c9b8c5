"""Baseline JPEG decoder goldens vs an INDEPENDENT in-test encoder.

The encoder below implements the forward path straight from ITU-T
T.81 (forward DCT with its own basis construction, quantization with
the Annex-K example tables, canonical Huffman coding with the
standard Annex-K tables, byte stuffing) — so the decoder in
``functions/jpeg.py`` is checked against a second implementation,
not itself.  JPEG is lossy, but the LOSS happens entirely at the
encoder's quantization step: given the encoder's quantized
coefficients, the decode (huffman → dequant → IDCT → clip) is
deterministic, so the test compares the decoder's pixels against the
test's OWN reference reconstruction of its quantized coefficients —
byte-exact except for float-rounding ties (allowed |diff| ≤ 1).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_pixels,
    idct2,
)

# ----- standard Annex-K tables -------------------------------------

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

DC_LUMA_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_SYMS = list(range(12))
AC_LUMA_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(counts, syms):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[syms[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _fdct_independent(block):
    """Forward DCT via the explicit T.81 formula (double loop) — an
    implementation independent of the decoder's matrix basis."""
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


def _size(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def encode_jpeg_gray(pixels: np.ndarray):
    """Independent baseline JFIF encoder (grayscale, Annex-K tables).
    Returns (jpeg_bytes, quantized_coefficient_blocks)."""
    h, w = pixels.shape
    dc_codes = _canonical_codes(DC_LUMA_COUNTS, DC_LUMA_SYMS)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)

    # pad to 8x8 blocks by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    img = np.zeros((ph, pw))
    img[:h, :w] = pixels
    img[h:, :w] = pixels[-1:, :]
    img[:, w:] = img[:, w - 1:w]

    bw = _BitWriter()
    pred = 0
    qblocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coeff = _fdct_independent(block)
            q = np.round(coeff / QT_LUMA).astype(np.int64)
            qblocks.append(q)
            zz = q.reshape(-1)[ZIGZAG]  # natural order → zigzag scan
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = _size(diff)
            ln, code = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zz[k]:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _size(v)
                ln, code = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                ln, code = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_qt = QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xDB, b"\x00" + zz_qt)
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_COUNTS) + bytes(DC_LUMA_SYMS)
        + bytes([0x10]) + bytes(AC_LUMA_COUNTS) + bytes(AC_LUMA_SYMS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blob = (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )
    return blob, qblocks, (ph, pw)


def _reference_reconstruct(qblocks, ph, pw, h, w):
    """The test's OWN inverse path over the quantized coefficients."""
    img = np.zeros((ph, pw))
    i = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = idct2(qblocks[i] * QT_LUMA) + 128.0
            img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
            i += 1
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]


def test_jpeg_gray_golden_smooth():
    """Smooth gradient: decoder output must match the reference
    reconstruction of the encoder's own quantized coefficients
    (|diff| ≤ 1 for float-rounding ties) and be close to the source."""
    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    px = ((yy * 6 + xx * 4) % 200 + 20).astype(np.float64)
    blob, qblocks, (ph, pw) = encode_jpeg_gray(px)
    got = decode_jpeg_pixels(blob)
    assert got.shape == (h, w, 1)
    ref = _reference_reconstruct(qblocks, ph, pw, h, w)
    diff = np.abs(got[..., 0].astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # and the lossy round-trip stays near the source for smooth input
    assert np.abs(got[..., 0].astype(int) - px.astype(int)).mean() < 6


def test_jpeg_gray_golden_random():
    """Adversarial high-frequency content exercises ZRL/EOB/long AC
    codes; the decoder must still invert the entropy coding exactly."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(24, 16)).astype(np.float64)
    blob, qblocks, (ph, pw) = encode_jpeg_gray(px)
    got = decode_jpeg_pixels(blob)
    ref = _reference_reconstruct(qblocks, ph, pw, 24, 16)
    diff = np.abs(got[..., 0].astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_jpeg_summary_and_dispatch():
    px = np.full((8, 8), 130.0)
    blob, qblocks, _ = encode_jpeg_gray(px)
    w, h, mean, bits = decode_jpeg(blob)
    assert (w, h, bits) == (8, 8, 8)
    assert abs(mean - 130) <= 2

    from pg_pb3_ld_spark.functions.multimodal import _decode_image

    assert _decode_image(blob, False) == (w, h, mean, bits)


def test_jpeg_rejects_unsupported():
    px = np.full((8, 8), 99.0)
    blob, _, _ = encode_jpeg_gray(px)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + blob)
    # a BASELINE stream relabeled SOF2 is malformed progressive (its
    # single scan has Ss=0, Se=63 — an illegal DC band): loud error,
    # never garbage pixels (real SOF2 decode: test_jpeg_progressive)
    prog = bytearray(blob)
    idx = blob.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="band"):
        decode_jpeg(bytes(prog))
    # lossless SOF3 (a process we really don't implement; SOF9
    # arithmetic is now real — test_jpeg_arith) still rejected loudly
    lossless = bytearray(blob)
    lossless[idx + 1] = 0xC3
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        decode_jpeg(bytes(lossless))


# ------------------------------------------------------------------
# color (3-component YCbCr, 4:2:0) — exercises MCU interleave,
# per-component table selection, and chroma upsampling
# ------------------------------------------------------------------

def _encode_block(bw, block, qt, dc_codes, ac_codes, pred):
    coeff = _fdct_independent(block - 128.0)
    q = np.round(coeff / qt).astype(np.int64)
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


def encode_jpeg_color_420(rgb: np.ndarray):
    """Independent 4:2:0 YCbCr baseline encoder (luma tables reused
    for chroma Huffman — legal; chroma uses the Annex-K chroma quant
    table).  Returns (bytes, {comp: [qblocks]}, padded dims)."""
    h, w, _ = rgb.shape
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    mcu_h, mcu_w = 16, 16
    ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16

    def pad(p):
        out = np.zeros((ph, pw))
        out[:h, :w] = p
        out[h:, :w] = p[-1:, :]
        out[:, w:] = out[:, w - 1:w]
        return out

    y, cb, cr = pad(y), pad(cb), pad(cr)
    # 4:2:0 chroma: average each 2x2
    cb_s = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr_s = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    dc_codes = _canonical_codes(DC_LUMA_COUNTS, DC_LUMA_SYMS)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)
    bw = _BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    qblocks = {"y": {}, "cb": {}, "cr": {}}
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by in range(2):
                for bx in range(2):
                    r0, c0 = my * 16 + by * 8, mx * 16 + bx * 8
                    blk = y[r0:r0 + 8, c0:c0 + 8]
                    q, preds["y"] = _encode_block(
                        bw, blk, QT_LUMA, dc_codes, ac_codes, preds["y"]
                    )
                    qblocks["y"][(my * 2 + by, mx * 2 + bx)] = q
            for name, plane in (("cb", cb_s), ("cr", cr_s)):
                r0, c0 = my * 8, mx * 8
                blk = plane[r0:r0 + 8, c0:c0 + 8]
                q, preds[name] = _encode_block(
                    bw, blk, QT_CHROMA, dc_codes, ac_codes, preds[name]
                )
                qblocks[name][(my, mx)] = q
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()) \
        + seg(0xDB, b"\x01" + QT_CHROMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_COUNTS) + bytes(DC_LUMA_SYMS)
        + bytes([0x10]) + bytes(AC_LUMA_COUNTS) + bytes(AC_LUMA_SYMS),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    blob = b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    return blob, qblocks, (ph, pw)


def test_jpeg_color_420_golden():
    rng = np.random.default_rng(21)
    h, w = 20, 28
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([
        (yy * 5 + 30) % 256, (xx * 5 + 60) % 256, (yy * 2 + xx * 2) % 256,
    ], axis=-1).astype(np.float64)
    blob, qb, (ph, pw) = encode_jpeg_color_420(rgb)
    got = decode_jpeg_pixels(blob)
    assert got.shape == (h, w, 3)

    # reference reconstruction mirroring the decoder contract
    yq = np.zeros((ph, pw))
    for (r, c), q in qb["y"].items():
        yq[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = idct2(q * QT_LUMA) + 128.0
    cbq = np.zeros((ph // 2, pw // 2))
    crq = np.zeros((ph // 2, pw // 2))
    for (r, c), q in qb["cb"].items():
        cbq[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = idct2(q * QT_CHROMA) + 128.0
    for (r, c), q in qb["cr"].items():
        crq[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = idct2(q * QT_CHROMA) + 128.0
    cb_f = np.repeat(np.repeat(cbq, 2, axis=0), 2, axis=1)[:h, :w] - 128.0
    cr_f = np.repeat(np.repeat(crq, 2, axis=0), 2, axis=1)[:h, :w] - 128.0
    y_f = yq[:h, :w]
    ref = np.clip(np.round(np.stack([
        y_f + 1.402 * cr_f,
        y_f - 0.344136 * cb_f - 0.714136 * cr_f,
        y_f + 1.772 * cb_f,
    ], axis=-1)), 0, 255).astype(np.uint8)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # and the smooth image survives the lossy trip recognizably
    assert np.abs(got.astype(int) - rgb.astype(int)).mean() < 12


def test_jpeg_through_resize_operator(spark):
    """JPEG blobs flow through the resize operator end-to-end."""
    from pg_pb3_ld_spark.functions.multimodal import resize_media

    px = np.full((16, 16), 90.0)
    blob, _, _ = encode_jpeg_gray(px)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, blob binary"
    )
    got = resize_media(df, 4, 4).collect()[0]
    assert got["error"] is None
    assert (got["out_h"], got["out_w"], got["n_channels"]) == (4, 4, 1)
    assert abs(got["mean_pixel"] - 90) <= 2
