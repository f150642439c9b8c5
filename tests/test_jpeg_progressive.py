"""Progressive JPEG (SOF2) goldens — round 4.

An independent in-test PROGRESSIVE encoder (spectral selection +
successive approximation per T.81 G.1.2, ported from the public
algorithm libjpeg implements) emits multi-scan streams from the same
quantized coefficients the baseline in-test encoder produces.  The
decisive check: **progressive decode must equal baseline decode of the
same image byte-for-byte** — both streams carry identical quantized
coefficients, and the baseline path is already golden-tested against a
reference reconstruction, so a matched encoder+decoder bug in the
progressive pair cannot hide.

Covered: DC first/refine (Al ladder), AC first per spectral band with
EOB-run codes (a custom DHT with EOBn symbols for runs > 1), AC
refinement with correction bits (the libjpeg encode/decode_mcu_AC_refine
duals), gray and 4:4:4 color, multi-level Al ladders, smooth images
(long EOB runs) and noise (dense coefficients).
"""

from __future__ import annotations

import struct

import numpy as np

from pg_pb3_ld_spark.functions.jpeg import ZIGZAG, decode_jpeg_pixels

try:
    from test_jpeg_real import (
        DC_LUMA_COUNTS,
        DC_LUMA_SYMS,
        QT_LUMA,
        _BitWriter,
        _canonical_codes,
        _fdct_independent,
        encode_jpeg_gray,
    )
except ImportError:  # tests imported as a package
    from tests.test_jpeg_real import (  # type: ignore
        DC_LUMA_COUNTS,
        DC_LUMA_SYMS,
        QT_LUMA,
        _BitWriter,
        _canonical_codes,
        _fdct_independent,
        encode_jpeg_gray,
    )

# AC table with EVERY (run<<4)|size symbol at 9 bits: progressive needs
# EOBn codes (r<<4 | 0, r=1..14) for runs > 1, which the Annex-K table
# lacks.  176 canonical 9-bit codes (all-ones 9-bit code unused, per
# T.81's reserved-code rule).
AC_PROG_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
AC_PROG_COUNTS = [0] * 16
AC_PROG_COUNTS[8] = len(AC_PROG_SYMS)  # all codes 9 bits long


def _quantized_blocks(pixels: np.ndarray):
    """Component raster of quantized coefficient blocks in ZIGZAG scan
    order (list of 64-int lists), same math as the baseline encoder."""
    h, w = pixels.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    img = np.zeros((ph, pw))
    img[:h, :w] = pixels
    img[h:, :w] = pixels[-1:, :]
    img[:, w:] = img[:, w - 1:w]
    out = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            q = np.round(_fdct_independent(block) / QT_LUMA).astype(np.int64)
            out.append([int(v) for v in q.reshape(-1)[ZIGZAG]])
    return out, ph, pw


class _ProgWriter:
    """Per-scan entropy writer with the EOB-run + buffered-correction-
    bit machinery shared by AC first/refine passes."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits riding the run

    def sym(self, s):
        ln, code = self.ac[s]
        self.bw.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def done(self):
        self.flush_eobrun()
        self.bw.flush()
        return bytes(self.bw.out)


def enc_dc_first(blocks, al, dc_codes):
    bw = _BitWriter()
    pred = 0
    for blk in blocks:
        v = blk[0] >> al  # arithmetic shift per T.81 G.1.2.1
        diff = v - pred
        pred = v
        t = diff.bit_length() if diff > 0 else (-diff).bit_length()
        ln, code = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    return bytes(bw.out)


def enc_dc_refine(blocks, al):
    bw = _BitWriter()
    for blk in blocks:
        bw.write((blk[0] >> al) & 1, 1)
    bw.flush()
    return bytes(bw.out)


def enc_ac_first(blocks, ss, se, al, ac_codes):
    w = _ProgWriter(ac_codes)
    for blk in blocks:
        band = []
        for k in range(ss, se + 1):
            v = blk[k]
            mag = (v if v >= 0 else -v) >> al
            band.append(mag if v >= 0 else -mag)
        last = -1
        for i, v in enumerate(band):
            if v:
                last = i
        if last < 0:
            w.eobrun += 1
            if w.eobrun == 0x7FFF:
                w.flush_eobrun()
            continue
        w.flush_eobrun()
        r = 0
        for v in band[: last + 1]:
            if v == 0:
                r += 1
                continue
            while r > 15:
                w.sym(0xF0)
                r -= 16
            s = v.bit_length() if v > 0 else (-v).bit_length()
            w.sym((r << 4) | s)
            w.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < se - ss:
            w.eobrun += 1
            if w.eobrun == 0x7FFF:
                w.flush_eobrun()
    return w.done()


def enc_ac_refine(blocks, ss, se, al, ac_codes):
    """The encode_mcu_AC_refine dual: newly-nonzero coefficients as
    (r,1) codes + sign bit, one buffered correction bit per
    already-nonzero coefficient, EOB runs carrying the buffer."""
    w = _ProgWriter(ac_codes)
    for blk in blocks:
        absval = []
        eob = -1
        for i, k in enumerate(range(ss, se + 1)):
            v = blk[k]
            t = (v if v >= 0 else -v) >> al
            absval.append(t)
            if t == 1:
                eob = i
        r = 0
        br: list[int] = []  # bits buffered since the last symbol
        for i, t in enumerate(absval):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                w.flush_eobrun()
                w.sym(0xF0)
                r -= 16
                for b in br:
                    w.bw.write(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            w.flush_eobrun()
            w.sym((r << 4) | 1)
            w.bw.write(1 if blk[ss + i] >= 0 else 0, 1)
            for b in br:
                w.bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            w.eobrun += 1
            w.pending.extend(br)
            if w.eobrun == 0x7FFF:
                w.flush_eobrun()
    return w.done()


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc, th, counts, syms):
    return _seg(
        0xC4,
        bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms),
    )


def encode_jpeg_gray_progressive(pixels: np.ndarray, script):
    """Multi-scan progressive stream for one gray component.
    ``script``: list of (ss, se, ah, al)."""
    blocks, ph, pw = _quantized_blocks(pixels)
    h, w = pixels.shape
    dc_codes = _canonical_codes(DC_LUMA_COUNTS, DC_LUMA_SYMS)
    ac_codes = _canonical_codes(AC_PROG_COUNTS, AC_PROG_SYMS)
    zz_qt = QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    parts = [
        b"\xff\xd8",
        _seg(0xDB, b"\x00" + zz_qt),
        _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])),
        _dht(0, 0, DC_LUMA_COUNTS, DC_LUMA_SYMS),
        _dht(1, 0, AC_PROG_COUNTS, AC_PROG_SYMS),
    ]
    for ss, se, ah, al in script:
        parts.append(
            _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        )
        if ss == 0:
            if ah == 0:
                parts.append(enc_dc_first(blocks, al, dc_codes))
            else:
                parts.append(enc_dc_refine(blocks, al))
        elif ah == 0:
            parts.append(enc_ac_first(blocks, ss, se, al, ac_codes))
        else:
            parts.append(enc_ac_refine(blocks, ss, se, al, ac_codes))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


LIBJPEG_LIKE_SCRIPT = [
    (0, 0, 0, 1),     # DC first, Al=1
    (1, 5, 0, 2),     # AC 1-5 first, Al=2
    (6, 63, 0, 2),    # AC 6-63 first, Al=2
    (1, 5, 2, 1),     # AC 1-5 refine 2→1
    (6, 63, 2, 1),    # AC 6-63 refine 2→1
    (0, 0, 1, 0),     # DC refine
    (1, 5, 1, 0),     # AC 1-5 refine 1→0
    (6, 63, 1, 0),    # AC 6-63 refine 1→0
]

SPECTRAL_ONLY_SCRIPT = [
    (0, 0, 0, 0),
    (1, 9, 0, 0),
    (10, 63, 0, 0),
]


def _gray_fixtures():
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:24, 0:40]
    smooth = ((yy * 5 + xx * 3) % 200 + 20).astype(np.float64)
    noise = rng.randint(0, 256, (17, 29)).astype(np.float64)
    flat = np.full((16, 16), 130.0)  # long EOB runs across blocks
    return {"smooth": smooth, "noise": noise, "flat": flat}


def test_progressive_equals_baseline_gray():
    """Same image → baseline stream and full SA-progressive stream →
    identical pixels (identical quantized coefficients by
    construction; the baseline decode is independently golden)."""
    for name, px in _gray_fixtures().items():
        base_blob, _, _ = encode_jpeg_gray(px)
        want = decode_jpeg_pixels(base_blob)
        prog = encode_jpeg_gray_progressive(px, LIBJPEG_LIKE_SCRIPT)
        got = decode_jpeg_pixels(prog)
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_progressive_spectral_selection_only():
    for name, px in _gray_fixtures().items():
        base_blob, _, _ = encode_jpeg_gray(px)
        want = decode_jpeg_pixels(base_blob)
        prog = encode_jpeg_gray_progressive(px, SPECTRAL_ONLY_SCRIPT)
        np.testing.assert_array_equal(
            decode_jpeg_pixels(prog), want, err_msg=name
        )


def test_progressive_eob_runs_exercised():
    """The flat fixture forces EOBn codes with run > 1 (every AC band
    empty in every block) — decode must still match, proving the
    EOB-run accumulation/consumption duals agree."""
    px = _gray_fixtures()["flat"]
    prog = encode_jpeg_gray_progressive(px, SPECTRAL_ONLY_SCRIPT)
    base_blob, _, _ = encode_jpeg_gray(px)
    np.testing.assert_array_equal(
        decode_jpeg_pixels(prog), decode_jpeg_pixels(base_blob)
    )


def test_progressive_color_444():
    """3-component 4:4:4: interleaved DC scan + per-component AC
    scans with an Al ladder."""
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (16, 24, 3)).astype(np.float64)
    # JFIF RGB→YCbCr (same formula as the baseline color encoder)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.500 * b + 128.0
    cr = 0.500 * r - 0.418688 * g - 0.081312 * b + 128.0
    comps_px = [y, cb, cr]
    comp_blocks = [_quantized_blocks(p)[0] for p in comps_px]

    dc_codes = _canonical_codes(DC_LUMA_COUNTS, DC_LUMA_SYMS)
    ac_codes = _canonical_codes(AC_PROG_COUNTS, AC_PROG_SYMS)
    h, w = 16, 24
    zz_qt = QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    sof_body = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    parts = [
        b"\xff\xd8",
        _seg(0xDB, b"\x00" + zz_qt),
        _seg(0xC2, sof_body),
        _dht(0, 0, DC_LUMA_COUNTS, DC_LUMA_SYMS),
        _dht(1, 0, AC_PROG_COUNTS, AC_PROG_SYMS),
    ]
    # interleaved DC first scan (all three components, one DC table):
    # MCU order (my, mx, comp) at 4:4:4 = per-component rasters zipped
    bw = _BitWriter()
    preds = [0, 0, 0]
    al = 1
    n_blocks = len(comp_blocks[0])
    for bi in range(n_blocks):
        for ci in range(3):
            v = comp_blocks[ci][bi][0] >> al
            diff = v - preds[ci]
            preds[ci] = v
            t = diff.bit_length() if diff > 0 else (-diff).bit_length()
            ln, code = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    parts.append(
        _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, al]))
    )
    parts.append(bytes(bw.out))
    # per-component AC first (Al=1) + refines (AC then DC)
    for cid, blocks in zip((1, 2, 3), comp_blocks):
        parts.append(_seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x01])))
        parts.append(enc_ac_first(blocks, 1, 63, 1, ac_codes))
    # DC refine (interleaved)
    bw = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(3):
            bw.write((comp_blocks[ci][bi][0] >> 0) & 1, 1)
    bw.flush()
    parts.append(
        _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, (1 << 4)]))
    )
    parts.append(bytes(bw.out))
    for cid, blocks in zip((1, 2, 3), comp_blocks):
        parts.append(_seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x10])))
        parts.append(enc_ac_refine(blocks, 1, 63, 0, ac_codes))
    parts.append(b"\xff\xd9")
    prog = b"".join(parts)

    # reference: reconstruct from the SAME quantized coefficients with
    # the decoder's own dequant+IDCT+color path via a baseline stream
    # is not available for 3×4:4:4 in the test encoder — instead check
    # against a direct coefficient reconstruction
    from pg_pb3_ld_spark.functions.jpeg import _A

    planes = []
    for blocks in comp_blocks:
        bh, bwid = 2, 3  # 16×24 → 2×3 blocks
        arr = np.array(blocks, dtype=np.int64)
        coeff = np.zeros_like(arr)
        coeff[:, ZIGZAG] = arr
        blk = coeff.reshape(-1, 8, 8).astype(np.float64) * QT_LUMA
        px = (_A.T @ blk @ _A) + 128.0
        planes.append(
            px.reshape(bh, bwid, 8, 8).transpose(0, 2, 1, 3).reshape(16, 24)
        )
    img = np.stack(planes, axis=-1)
    yc = img[..., 0]
    cbv = img[..., 1] - 128.0
    crv = img[..., 2] - 128.0
    want = np.clip(np.round(np.stack([
        yc + 1.402 * crv,
        yc - 0.344136 * cbv - 0.714136 * crv,
        yc + 1.772 * cbv,
    ], axis=-1)), 0, 255).astype(np.uint8)

    np.testing.assert_array_equal(decode_jpeg_pixels(prog), want)


def test_progressive_through_media_operator(spark):
    """The mapInPandas resize operator decodes progressive blobs too —
    the dispatch path, not just the raw function."""
    import pandas as pd

    from pg_pb3_ld_spark.functions.multimodal import resize_media

    px = _gray_fixtures()["smooth"]
    prog = encode_jpeg_gray_progressive(px, LIBJPEG_LIKE_SCRIPT)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "blob": [bytearray(prog)]})
    )
    row = resize_media(df, 6, 6).collect()[0]
    assert row["error"] is None
    assert (row["out_h"], row["out_w"], row["n_channels"]) == (6, 6, 1)
