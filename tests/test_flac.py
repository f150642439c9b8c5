"""FLAC codec tests.

Golden discipline as for the JPEG/PNG/ADPCM families: the engine
decoder is checked against an INDEPENDENT in-test frame writer (its
own bit writer, its own CRC fold) exercising the paths the engine's
encoder never emits — LPC, VERBATIM, mid/side + left/side +
right/side decorrelation, Rice2 (5-bit) params, partition order > 0,
wasted bits, escape partitions — plus exact lossless round-trips of
the engine encoder and loud-failure checks for corrupted CRCs.
"""

from __future__ import annotations

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_frame_sample,
)


# ----- independent writer (test-side implementation) ----------------


class W:
    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)
        return self

    def bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return bytes(
            int("".join(map(str, self.bits[i:i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def crc8_ref(data):
    # bitwise (no table) — independent of the engine's LUT fold
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else crc << 1
    return crc


def crc16_ref(data):
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def streaminfo(sr, nch, bits, total, blocksize):
    w = W()
    w.w(blocksize, 16).w(blocksize, 16).w(0, 24).w(0, 24)
    w.w(sr, 20).w(nch - 1, 3).w(bits - 1, 5).w(total, 36)
    body = w.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def frame_header(blocksize, ch_code, bits, frame_no=0):
    w = W()
    w.w(0x3FFE, 14).w(0, 1).w(0, 1)
    w.w(7, 4)           # explicit 16-bit blocksize
    w.w(0, 4)           # rate from streaminfo
    w.w(ch_code, 4)
    w.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
    w.w(0, 1)
    w.w(frame_no, 8)    # fits <0x80 in these tests
    w.w(blocksize - 1, 16)
    hdr = w.bytes()
    return hdr + bytes([crc8_ref(hdr)])


def rice_residual(w, resid, param, method=0, porder=0, pred_order=0):
    plen = 4 if method == 0 else 5
    w.w(method, 2).w(porder, 4)
    n = len(resid) + pred_order
    psize = n >> porder
    idx = 0
    for p in range(1 << porder):
        count = psize - (pred_order if p == 0 else 0)
        w.w(param, plen)
        for r in resid[idx:idx + count]:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            w.w(0, u >> param).w(1, 1).w(u & ((1 << param) - 1), param)
        idx += count


def finish_frame(hdr, w):
    body = hdr + w.bytes()
    return body + crc16_ref(body).to_bytes(2, "big")


def signed(v, n):
    return v & ((1 << n) - 1)


# ----- engine encoder round-trips (lossless ⇒ exact) ----------------


def test_roundtrip_smooth_mono_exact():
    t = np.arange(9000)
    pcm = (np.sin(t / 40) * 12000 + (t % 7)).astype(np.int64)
    sr, nch, bits, frames = decode_flac(encode_flac(pcm, 16000))
    assert (sr, nch, bits) == (16000, 1, 16)
    assert np.array_equal(np.concatenate([f[:, 0] for f in frames]), pcm)


def test_roundtrip_noise_and_stereo_exact():
    rng = np.random.default_rng(11)
    noise = rng.integers(-32768, 32768, size=(5000, 2))
    _, nch, _, frames = decode_flac(
        encode_flac(noise, 44100, blocksize=1024)
    )
    assert nch == 2
    assert np.array_equal(np.concatenate(frames), noise)


def test_roundtrip_constant_and_short_tail():
    pcm = np.concatenate([np.full(4096, 77), np.arange(100)])
    _, _, _, frames = decode_flac(encode_flac(pcm, 8000))
    assert [len(f) for f in frames] == [4096, 100]
    assert np.array_equal(np.concatenate([f[:, 0] for f in frames]), pcm)


def test_roundtrip_8bit():
    pcm = (np.arange(600) % 200) - 100
    _, _, bits, frames = decode_flac(encode_flac(pcm, 8000, bits=8))
    assert bits == 8
    assert np.array_equal(frames[0][:, 0], pcm)


# ----- independent writer goldens (paths the encoder never emits) ---


def _decode_one(sr, nch, bits, frame):
    blob = streaminfo(sr, nch, bits, 0, 16) + frame
    return decode_flac(blob)[3][0]


def test_verbatim_subframe():
    samples = [5, -6, 10000, -32768, 32767, 0, 1, -1]
    hdr = frame_header(len(samples), 0, 16)
    w = W()
    w.w(0, 1).w(1, 6).w(0, 1)  # VERBATIM, no wasted bits
    for s in samples:
        w.w(signed(s, 16), 16)
    out = _decode_one(8000, 1, 16, finish_frame(hdr, w))
    assert out[:, 0].tolist() == samples


def test_lpc_subframe_order2():
    # s[n] = ((3*s[n-1] - 1*s[n-2]) >> 1) + r[n]
    warm = [100, 110]
    resid = [3, -2, 5, 0, -7, 1]
    hdr = frame_header(8, 0, 16)
    w = W()
    w.w(0, 1).w(33, 6).w(0, 1)          # LPC order 2
    for s in warm:
        w.w(signed(s, 16), 16)
    w.w(14, 4)                           # precision 15
    w.w(1, 5)                            # shift 1
    w.w(signed(3, 15), 15).w(signed(-1, 15), 15)
    rice_residual(w, resid, param=3, pred_order=2)
    out = _decode_one(8000, 1, 16, finish_frame(hdr, w))[:, 0].tolist()
    expect = list(warm)
    for r in resid:
        expect.append(((3 * expect[-1] - expect[-2]) >> 1) + r)
    assert out == expect


def test_stereo_decorrelation_modes():
    left = [100, 120, -40, 7]
    right = [90, 115, -50, 3]
    side = [l - r for l, r in zip(left, right)]

    def const_sub(w, vals, bits):
        # verbatim is simplest for arbitrary per-sample values
        w.w(0, 1).w(1, 6).w(0, 1)
        for v in vals:
            w.w(signed(v, bits), bits)

    # left/side (code 8): ch0 = left @16, ch1 = side @17
    hdr = frame_header(4, 8, 16)
    w = W()
    const_sub(w, left, 16)
    const_sub(w, side, 17)
    out = _decode_one(8000, 2, 16, finish_frame(hdr, w))
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right

    # right/side (code 9): ch0 = side @17, ch1 = right @16
    hdr = frame_header(4, 9, 16)
    w = W()
    const_sub(w, side, 17)
    const_sub(w, right, 16)
    out = _decode_one(8000, 2, 16, finish_frame(hdr, w))
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right

    # mid/side (code 10): ch0 = (l+r)>>1 @16, ch1 = side @17
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    hdr = frame_header(4, 10, 16)
    w = W()
    const_sub(w, mid, 16)
    const_sub(w, side, 17)
    out = _decode_one(8000, 2, 16, finish_frame(hdr, w))
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right


def test_rice2_multi_partition_and_escape():
    # FIXED order 1, 8 samples, partition order 1 (2 partitions of 4),
    # method 1 (5-bit params); second partition escapes to raw 6-bit
    warm = [50]
    resid = [1, -2, 3, 9, -5, 6, -7]     # part0: 3 resid, part1: 4
    hdr = frame_header(8, 0, 16)
    w = W()
    w.w(0, 1).w(9, 6).w(0, 1)            # FIXED order 1
    w.w(signed(warm[0], 16), 16)
    w.w(1, 2).w(1, 4)                    # method 1, porder 1
    w.w(2, 5)                            # part0: rice2 param 2
    for r in resid[:3]:
        u = (r << 1) if r >= 0 else ((-r << 1) - 1)
        w.w(0, u >> 2).w(1, 1).w(u & 3, 2)
    w.w(31, 5).w(6, 5)                   # part1: escape, 6 raw bits
    for r in resid[3:]:
        w.w(signed(r, 6), 6)
    out = _decode_one(8000, 1, 16, finish_frame(hdr, w))[:, 0].tolist()
    expect = list(warm)
    for r in resid:
        expect.append(expect[-1] + r)
    assert out == expect


def test_wasted_bits_shift():
    # CONSTANT with 2 wasted bits: stored 25 @14 bits → sample 100
    hdr = frame_header(4, 0, 16)
    w = W()
    w.w(0, 1).w(0, 6)
    w.w(1, 1).w(0, 1).w(1, 1)            # wasted flag + unary "1" ⇒ k=2
    w.w(signed(25, 14), 14)
    out = _decode_one(8000, 1, 16, finish_frame(hdr, w))
    assert out[:, 0].tolist() == [100] * 4


# ----- loud failures ------------------------------------------------


def test_crc_corruption_detected():
    pcm = np.arange(500) - 250
    blob = bytearray(encode_flac(pcm, 8000))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"xxxx" + bytes(blob[4:]))
    bad = bytearray(blob)
    bad[-3] ^= 0x01                       # flip a bit in the last frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:-10]))    # truncated


def test_crc_tables_match_bitwise_reference():
    data = bytes(range(256)) * 3
    assert crc8(data) == crc8_ref(data)
    assert crc16(data) == crc16_ref(data)


# ----- Spark operator ----------------------------------------------


def test_flac_frame_sample_operator(spark):
    import pandas as pd  # noqa: F401

    rows = []
    expect = {}
    for mid in range(4):
        pcm = ((np.arange(1200) * (mid + 3)) % 997) - 498
        rows.append((mid, bytearray(encode_flac(pcm, 8000, blocksize=512))))
        for k, s in enumerate(range(0, 1200, 512)):
            seg = pcm[s:s + 512]
            expect[(mid, k)] = (
                len(seg), int(np.abs(seg).sum()),
                int(seg.max()), int(seg.min()),
            )
    rows.append((99, bytearray(b"not flac at all")))
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    df = spark.createDataFrame(rows, StructType([
        StructField("media_id", LongType()),
        StructField("blob", BinaryType()),
    ]))
    out = flac_frame_sample(df).collect()
    good = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(bad) == 1 and bad[0].media_id == 99
    assert "magic" in bad[0].error
    assert len(good) == 4 * 3
    for r in good:
        n, sa, mx, mn = expect[(r.media_id, r.frame_idx)]
        assert (r.n_samples, r.sum_abs, r.max_s, r.min_s) == (n, sa, mx, mn)
        assert r.n_channels == 1
