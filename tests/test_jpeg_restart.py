"""Restart-marker (DRI/RSTn) coverage for BOTH JPEG processes —
previously implemented but untested in either.

Independent encoders emit real restart markers (byte-align, RSTn,
DC-predictor reset — and EOB-run flush in progressive scans); decode
must be pixel-identical to the restart-free stream of the same image.
"""

from __future__ import annotations

import struct

import numpy as np

from pg_pb3_ld_spark.functions.jpeg import ZIGZAG, decode_jpeg_pixels

try:
    from test_jpeg_real import (
        AC_LUMA_COUNTS,
        AC_LUMA_SYMS,
        DC_LUMA_COUNTS,
        DC_LUMA_SYMS,
        QT_LUMA,
        _BitWriter,
        _canonical_codes,
        _size,
        encode_jpeg_gray,
    )
    from test_jpeg_progressive import (
        AC_PROG_COUNTS,
        AC_PROG_SYMS,
        _dht,
        _quantized_blocks,
        _seg,
        enc_ac_first,
        encode_jpeg_gray_progressive,
        SPECTRAL_ONLY_SCRIPT,
    )
except ImportError:  # tests imported as a package
    from tests.test_jpeg_real import (  # type: ignore
        AC_LUMA_COUNTS, AC_LUMA_SYMS, DC_LUMA_COUNTS, DC_LUMA_SYMS,
        QT_LUMA, _BitWriter, _canonical_codes, _size, encode_jpeg_gray,
    )
    from tests.test_jpeg_progressive import (  # type: ignore
        AC_PROG_COUNTS, AC_PROG_SYMS, _dht, _quantized_blocks, _seg,
        enc_ac_first, encode_jpeg_gray_progressive, SPECTRAL_ONLY_SCRIPT,
    )


def encode_jpeg_gray_dri(pixels: np.ndarray, dri: int) -> bytes:
    """Baseline gray encoder with a DRI segment and RSTn every ``dri``
    MCUs (byte-align + marker + DC predictor reset)."""
    blocks, ph, pw = _quantized_blocks(pixels)
    h, w = pixels.shape
    dc_codes = _canonical_codes(DC_LUMA_COUNTS, DC_LUMA_SYMS)
    ac_codes = _canonical_codes(AC_LUMA_COUNTS, AC_LUMA_SYMS)
    bw = _BitWriter()
    pred = 0
    rst = 0
    for n, zz in enumerate(blocks):
        if dri and n and n % dri == 0:
            bw.flush()  # byte-align (1-bit padding per spec)
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = 0
        diff = zz[0] - pred
        pred = zz[0]
        t = _size(diff)
        ln, code = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        last = 0
        for k in range(1, 64):
            if zz[k]:
                last = k
        run = 0
        for k in range(1, last + 1):
            v = zz[k]
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
        if last < 63:
            ln, code = ac_codes[0x00]
            bw.write(code, ln)
    bw.flush()
    zz_qt = QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    return (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + zz_qt)
        + _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + _dht(0, 0, DC_LUMA_COUNTS, DC_LUMA_SYMS)
        + _dht(1, 0, AC_LUMA_COUNTS, AC_LUMA_SYMS)
        + _seg(0xDD, struct.pack(">H", dri))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_baseline_restart_markers_gray():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (24, 32)).astype(np.float64)  # 12 MCUs
    want = decode_jpeg_pixels(encode_jpeg_gray(px)[0])
    for dri in (1, 4, 5):
        got = decode_jpeg_pixels(encode_jpeg_gray_dri(px, dri))
        np.testing.assert_array_equal(got, want, err_msg=f"dri={dri}")


def _prog_dri_gray(pixels: np.ndarray, dri: int) -> bytes:
    """Progressive gray (spectral-selection script) with RSTn every
    ``dri`` blocks in EVERY scan — DC predictor reset in the DC scan,
    EOB-run flush in AC scans."""
    blocks, _, _ = _quantized_blocks(pixels)
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
        _seg(0xDD, struct.pack(">H", dri)),
    ]
    # DC scan with restarts
    bw = _BitWriter()
    pred = 0
    rst = 0
    for n, blk in enumerate(blocks):
        if dri and n and n % dri == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = 0
        v = blk[0]
        diff = v - pred
        pred = v
        t = _size(diff)
        ln, code = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    parts.append(_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])))
    parts.append(bytes(bw.out))
    # AC scans with restarts: encode each dri-sized group of blocks as
    # its own restart interval (EOB runs cannot span a marker)
    for ss, se in ((1, 9), (10, 63)):
        out = bytearray()
        rst = 0
        for g0 in range(0, len(blocks), dri):
            seg_bytes = enc_ac_first(blocks[g0:g0 + dri], ss, se, 0,
                                     ac_codes)
            if g0:
                out += bytes([0xFF, 0xD0 + ((rst - 1) % 8)])
            rst += 1
            out += seg_bytes
        parts.append(_seg(0xDA, bytes([1, 1, 0x00, ss, se, 0x00])))
        parts.append(bytes(out))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_progressive_restart_markers_gray():
    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, (16, 40)).astype(np.float64)  # 10 blocks
    base = encode_jpeg_gray_progressive(px, SPECTRAL_ONLY_SCRIPT)
    want = decode_jpeg_pixels(base)
    for dri in (3, 4):
        got = decode_jpeg_pixels(_prog_dri_gray(px, dri))
        np.testing.assert_array_equal(got, want, err_msg=f"dri={dri}")
