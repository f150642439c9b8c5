"""Arithmetic-coded sequential JPEG (SOF9) goldens.

Same discipline as the baseline/progressive families: an in-test
encoder built INDEPENDENTLY of the decoder (the ``ArithEncoder``
constructs the code stream from the exact big-integer interval base,
not by mirroring the decoder's register loop), quantized
coefficients reused from ``test_jpeg_real``'s Annex-K encoder, and
a decisive cross-check — the arithmetic stream must decode to
pixels IDENTICAL to the baseline Huffman stream of the very same
coefficients (decode of given coefficients is deterministic).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.jpeg import ZIGZAG, decode_jpeg_pixels
from pg_pb3_ld_spark.functions.jpeg_arith import (
    AC_STAT_BINS,
    DC_STAT_BINS,
    FIXED_STATE,
    ArithDecoder,
    ArithEncoder,
    classify_dc_diff,
)

from test_jpeg_real import QT_LUMA, encode_jpeg_gray


# ----- coder primitives: encode → decode round-trip -----------------


@pytest.mark.parametrize("seed,p1", [(1, 0.5), (2, 0.9), (3, 0.05),
                                     (4, 0.3), (5, 0.98)])
def test_coder_roundtrip_random(seed, p1):
    rng = np.random.RandomState(seed)
    n = 4000
    ctxs = rng.randint(0, 24, n).tolist()
    bits = (rng.random_sample(n) < p1).astype(int).tolist()
    enc = ArithEncoder()
    st_e = bytearray(24)
    for c, b in zip(ctxs, bits):
        enc.code(st_e, c, b)
    data = enc.flush()
    dec = ArithDecoder(data, 0, len(data))
    st_d = bytearray(24)
    got = [dec.decode(st_d, c) for c in ctxs]
    assert got == bits
    # the adaptive state must evolve identically on both sides
    assert st_d == st_e


def test_coder_roundtrip_exercises_stuffing():
    """At least one generated stream must contain 0xFF data bytes so
    the 7-bit stuffed-byte rule is actually on the tested path."""
    seen_ff = False
    for seed in range(24):
        rng = np.random.RandomState(100 + seed)
        n = 3000
        ctxs = rng.randint(0, 8, n).tolist()
        bits = (rng.random_sample(n) < 0.5).astype(int).tolist()
        enc = ArithEncoder()
        st_e = bytearray(8)
        for c, b in zip(ctxs, bits):
            enc.code(st_e, c, b)
        data = enc.flush()
        seen_ff = seen_ff or b"\xff" in data
        dec = ArithDecoder(data, 0, len(data))
        st_d = bytearray(8)
        assert [dec.decode(st_d, c) for c in ctxs] == bits
    assert seen_ff


def test_coder_fixed_bin_never_adapts():
    enc = ArithEncoder()
    fixed = bytearray([FIXED_STATE])
    bits = [0, 1, 1, 0, 1, 0, 0, 1] * 40
    for b in bits:
        enc.code(fixed, 0, b)
    assert fixed[0] & 0x7F == FIXED_STATE     # index unchanged
    data = enc.flush()
    dec = ArithDecoder(data, 0, len(data))
    fixed_d = bytearray([FIXED_STATE])
    assert [dec.decode(fixed_d, 0) for _ in bits] == bits


# ----- model encoder (sequential DCT statistical model) -------------


def _code_dc(enc, stats, ctx, diff, cond):
    low, up = cond
    if diff == 0:
        enc.code(stats, ctx, 0)
        return 0
    enc.code(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.code(stats, ctx + 1, sign)
    sz = abs(diff) - 1
    st = ctx + 2 + sign
    if sz == 0:
        enc.code(stats, st, 0)
        m = 0
    else:
        enc.code(stats, st, 1)
        m = 1
        st = 20
        while (m << 1) <= sz:
            enc.code(stats, st, 1)
            m <<= 1
            st += 1
        enc.code(stats, st, 0)
    nxt = classify_dc_diff(m, sign, low, up)
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.code(stats, st, 1 if sz & mm else 0)
    return nxt


def _code_ac(enc, stats, fixed, kx, zz):
    last = 0
    for k in range(1, 64):
        if zz[k]:
            last = k
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        enc.code(stats, st, 0)          # not EOB yet
        while zz[k] == 0:
            enc.code(stats, st + 1, 0)
            st += 3
            k += 1
        enc.code(stats, st + 1, 1)
        v = int(zz[k])
        enc.code(fixed, 0, 1 if v < 0 else 0)
        sz = abs(v) - 1
        st += 2
        if sz == 0:
            enc.code(stats, st, 0)
            m = 0
        elif sz == 1:
            enc.code(stats, st, 1)
            enc.code(stats, st, 0)
            m = 1
        else:
            enc.code(stats, st, 1)
            enc.code(stats, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while (m << 1) <= sz:
                enc.code(stats, st, 1)
                m <<= 1
                st += 1
            enc.code(stats, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.code(stats, st, 1 if sz & mm else 0)
        k += 1
    if last < 63:
        enc.code(stats, 3 * (k - 1), 1)  # EOB


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_gray_arith(
    pixels: np.ndarray, cond=(0, 1), kx=5, dri=0,
) -> bytes:
    """SOF9 stream over the SAME quantized coefficients the Huffman
    golden encoder produces for ``pixels``."""
    h, w = pixels.shape
    _, qblocks, (_ph, _pw) = encode_jpeg_gray(pixels)

    def fresh():
        return (
            ArithEncoder(), bytearray(DC_STAT_BINS),
            bytearray(AC_STAT_BINS), bytearray([FIXED_STATE]),
        )

    enc, dcs, acs, fixed = fresh()
    chunks = []
    pred, ctx = 0, 0
    for i, q in enumerate(qblocks):
        if dri and i and i % dri == 0:
            chunks.append(enc.flush())
            chunks.append(bytes([0xFF, 0xD0 + ((i // dri - 1) % 8)]))
            enc, dcs, acs, fixed = fresh()
            pred, ctx = 0, 0
        zz = q.reshape(-1)[ZIGZAG]
        dc = int(zz[0])
        ctx = _code_dc(enc, dcs, ctx, dc - pred, cond)
        pred = dc
        _code_ac(enc, acs, fixed, kx, zz)
    chunks.append(enc.flush())
    entropy = b"".join(chunks)

    low, up = cond
    zz_qt = QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + zz_qt)
        + _seg(0xC9, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + _seg(0xCC, bytes([0x00, (up << 4) | low, 0x10, kx]))
    )
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + entropy + b"\xff\xd9"
    return out


# ----- goldens: arith decode == Huffman decode of same coeffs -------


def _structured(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 6 + xx * 4 + seed * 13) % 200 + 20).astype(np.float64)


def test_arith_equals_baseline_smooth():
    px = _structured(16, 24)
    base, _, _ = encode_jpeg_gray(px)
    arith = encode_jpeg_gray_arith(px)
    got_a = decode_jpeg_pixels(arith)
    got_b = decode_jpeg_pixels(base)
    assert got_a.shape == (16, 24, 1)
    assert (got_a == got_b).all()


def test_arith_equals_baseline_random_highfreq():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (24, 16)).astype(np.float64)
    base, _, _ = encode_jpeg_gray(px)
    arith = encode_jpeg_gray_arith(px)
    assert (decode_jpeg_pixels(arith) == decode_jpeg_pixels(base)).all()


def test_arith_nondefault_conditioning():
    """Non-default DAC (L=1, U=2, Kx=2) must round-trip too — the
    conditioning changes context selection on both sides."""
    px = _structured(24, 24, seed=3)
    base, _, _ = encode_jpeg_gray(px)
    arith = encode_jpeg_gray_arith(px, cond=(1, 2), kx=2)
    assert (decode_jpeg_pixels(arith) == decode_jpeg_pixels(base)).all()


def test_arith_restart_markers():
    px = _structured(16, 40, seed=5)       # 10 MCUs, restart every 3
    base, _, _ = encode_jpeg_gray(px)
    arith = encode_jpeg_gray_arith(px, dri=3)
    assert b"\xff\xd0" in arith
    assert (decode_jpeg_pixels(arith) == decode_jpeg_pixels(base)).all()


def test_arith_via_multimodal_features():
    """The SOF9 path is reachable from the standard media operator
    entry points (decode_jpeg summary + full decode)."""
    from pg_pb3_ld_spark.functions.jpeg import decode_jpeg

    px = _structured(16, 16, seed=9)
    arith = encode_jpeg_gray_arith(px)
    w, h, mean, bits = decode_jpeg(arith)
    assert (w, h, bits) == (16, 16, 8)
    ref = decode_jpeg_pixels(arith)
    assert mean == int(ref.mean())
