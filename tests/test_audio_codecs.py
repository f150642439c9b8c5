"""Compressed-audio WAV codecs (round 4): G.711 μ-law / A-law and
IMA ADPCM, golden-tested against INDEPENDENT in-test implementations
(the encoder direction for G.711, a second structurally-different
decoder for ADPCM) — closing the round-3 'non-WAV-PCM audio stubbed'
gap with real public-spec codecs rather than library bindings.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.multimodal import (
    _g711_lut,
    _IMA_INDEX,
    _IMA_STEPS,
    decode_wav,
    wav_samples,
)


# ------------------------------------------------------------ G.711


def ulaw_encode(x: int) -> int:
    """Independent μ-law compressor per the G.711 segment algorithm."""
    BIAS, CLIP = 0x84, 32635
    sign = 0x80 if x < 0 else 0
    x = min(abs(x), CLIP) + BIAS
    exp = x.bit_length() - 8  # position of the segment MSB
    mant = (x >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def test_ulaw_lut_properties():
    lut = _g711_lut("ulaw")
    # both zero codes decode to 0; table is odd-symmetric in the sign bit
    assert lut[0xFF] == 0
    assert int(lut[0x7F]) == 0
    for b in range(256):
        assert int(lut[b]) == -int(lut[b ^ 0x80]) or lut[b] == 0
    # strictly monotone within the positive half (0xFF down to 0x80)
    pos = [int(lut[b]) for b in range(0xFF, 0x7F, -1)]
    assert all(b2 > b1 for b1, b2 in zip(pos, pos[1:]))


def test_ulaw_roundtrip_quantization_bound():
    """decode(encode(x)) must land within the segment's quantization
    step of x — the defining G.711 property, with the encoder written
    independently of the expansion LUT."""
    lut = _g711_lut("ulaw")
    rng = np.random.RandomState(7)
    xs = np.concatenate([
        rng.randint(-32000, 32001, 500),
        np.array([0, 1, -1, 31, -33, 0x84, -0x84, 32635, -32635]),
    ])
    for x in xs:
        x = int(x)
        b = ulaw_encode(x)
        d = int(lut[b])
        exp = (~b & 0x70) >> 4
        step = 1 << (exp + 3)
        assert abs(d - max(min(x, 32635), -32635)) <= step, (x, b, d)


def test_ulaw_encode_decode_idempotent():
    """encode(decode(b)) == b for every byte except the two ±0 codes
    (the classic G.711 involution check)."""
    lut = _g711_lut("ulaw")
    for b in range(256):
        d = int(lut[b])
        if d == 0:
            continue  # 0x7F/0xFF both mean zero — ambiguous by design
        assert ulaw_encode(d) == b, (b, d)


def test_alaw_lut_known_values():
    lut = _g711_lut("alaw")
    # A-law sign bit SET means POSITIVE (opposite of μ-law; Sun g711.c
    # alaw2linear): byte 0xD5 (= 0x55 | 0x80) → +8, byte 0x55 → -8.
    assert int(lut[0xD5]) == 8
    assert int(lut[0x55]) == -8
    # sign symmetry
    for b in range(256):
        assert int(lut[b]) == -int(lut[b ^ 0x80])
    # segment-0 values are 8, 24, 40, … (16k+8 for 13-bit magnitudes ×8)
    seg0 = sorted(int(lut[b]) for b in range(256) if 0 < int(lut[b]) <= 256)
    assert seg0[:4] == [8, 24, 40, 56]


# -------------------------------------------------------- IMA ADPCM


def ima_encode(samples: np.ndarray, samples_per_block: int) -> bytes:
    """Independent mono IMA ADPCM encoder (standard forward
    quantizer; predictor/step updated with the decoder rule)."""
    steps = _IMA_STEPS.tolist()
    idxtab = _IMA_INDEX.tolist()
    out = bytearray()
    i = 0
    pred, idx = 0, 0
    while i < len(samples):
        chunk = samples[i:i + samples_per_block]
        i += samples_per_block
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            s = int(s)
            step = steps[idx]
            diff = s - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            vp = step >> 3
            if nib & 4:
                vp += step
            if nib & 2:
                vp += step >> 1
            if nib & 1:
                vp += step >> 2
            pred = pred - vp if nib & 8 else pred + vp
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + idxtab[nib]))
            nibbles.append(nib)
        while len(nibbles) % 8:
            nibbles.append(0)  # pad the final 4-byte word
        for k in range(0, len(nibbles), 2):
            out.append(nibbles[k] | (nibbles[k + 1] << 4))
    return bytes(out)


def ima_decode_reference(data: bytes, block_align: int) -> list[int]:
    """Second, structurally different mono decoder (nibble generator +
    functional state update) for dual-implementation comparison."""
    steps = _IMA_STEPS.tolist()
    idxtab = _IMA_INDEX.tolist()
    out: list[int] = []
    for b0 in range(0, len(data) - 3, block_align):
        block = data[b0:b0 + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        idx = block[2]
        out.append(pred)

        def nibbles():
            for byte in block[4:]:
                yield byte & 0x0F
                yield byte >> 4

        for nib in nibbles():
            step = steps[idx]
            mag = (step >> 3) + (step if nib & 4 else 0) \
                + ((step >> 1) if nib & 2 else 0) \
                + ((step >> 2) if nib & 1 else 0)
            pred = pred + (-mag if nib & 8 else mag)
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + idxtab[nib]))
            out.append(pred)
    return out


def _wav(fmt_tag: int, ch: int, rate: int, bits: int, block_align: int,
         data: bytes) -> bytes:
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, ch, rate,
        rate * max(block_align, 1), block_align, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _sine(n: int, amp: int = 12000, period: float = 37.0) -> np.ndarray:
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * t / period)).astype(np.int16)


def test_ima_adpcm_engine_matches_independent_decoder():
    sig = _sine(4 * 505)  # several blocks incl. a padded tail
    spb = 505  # samples per block → block_align = 4 + 252 = 256
    data = ima_encode(sig, spb)
    block_align = 4 + (spb - 1 + 7) // 8 * 4
    rate, chn, got = wav_samples(_wav(0x11, 1, 8000, 4, block_align, data))
    want = ima_decode_reference(data, block_align)
    assert (rate, chn) == (8000, 1)
    assert got.tolist() == want[: len(got)]


def test_ima_adpcm_tracks_the_signal():
    """ADPCM is lossy but must track a smooth signal closely once the
    step size adapts (correlation > 0.99 over the tail)."""
    sig = _sine(1017)
    spb = 1017
    data = ima_encode(sig, spb)
    block_align = 4 + (spb - 1 + 7) // 8 * 4
    _, _, got = wav_samples(_wav(0x11, 1, 8000, 4, block_align, data))
    dec = got[: len(sig)].astype(np.float64)
    ref = sig.astype(np.float64)
    tail = slice(100, len(sig))
    corr = np.corrcoef(dec[tail], ref[tail])[0, 1]
    assert corr > 0.99, corr


def test_g711_wav_through_decode_and_framesample():
    sig = _sine(800)
    lut = _g711_lut("ulaw")
    enc = bytes(ulaw_encode(int(s)) for s in sig)
    blob = _wav(7, 1, 8000, 8, 1, enc)
    rate, chn, frames, mean_abs = decode_wav(blob)
    assert (rate, chn, frames) == (8000, 1, 800)
    # summary mean must equal the LUT expansion exactly
    want = np.abs(lut[np.frombuffer(enc, np.uint8)].astype(np.int32)).mean()
    assert mean_abs == int(want)


def test_unsupported_codec_still_loud():
    blob = _wav(3, 1, 8000, 32, 4, b"\x00" * 64)  # IEEE float: not impl
    with pytest.raises(ValueError, match="unsupported WAV codec"):
        decode_wav(blob)


def test_compressed_audio_through_spark_operator(spark):
    """μ-law and IMA ADPCM WAVs through the mapInPandas frame-sample
    operator — the full dispatch path, per-row errors stay None."""
    import pandas as pd

    from pg_pb3_ld_spark.functions.multimodal import sample_audio_frames

    sig = _sine(1600)
    ulaw_blob = _wav(
        7, 1, 8000, 8, 1, bytes(ulaw_encode(int(s)) for s in sig)
    )
    spb = 505
    adpcm_data = ima_encode(sig, spb)
    block_align = 4 + (spb - 1 + 7) // 8 * 4
    adpcm_blob = _wav(0x11, 1, 8000, 4, block_align, adpcm_data)
    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2],
            "blob": [bytearray(ulaw_blob), bytearray(adpcm_blob)],
        })
    )
    rows = sample_audio_frames(df, n_frames=3).collect()
    assert len(rows) == 6
    assert all(r["error"] is None for r in rows)
    assert any(r["rms"] > 0 for r in rows)


def test_ima_adpcm_stereo_word_interleave():
    """Stereo blocks interleave 4-byte nibble words per channel after
    the per-channel headers; the decoded stream must equal the
    frame-interleave of two independent mono decodes."""
    left = _sine(505, amp=9000, period=29.0)
    right = _sine(505, amp=5000, period=53.0)
    spb = 505
    mono_align = 4 + (spb - 1 + 7) // 8 * 4
    lb = ima_encode(left, spb)
    rb = ima_encode(right, spb)
    assert len(lb) == len(rb) == mono_align
    # stereo block: ch0 header, ch1 header, then alternating 4-byte
    # words from each channel's nibble body
    body_l, body_r = lb[4:], rb[4:]
    words = bytearray(lb[:4] + rb[:4])
    for k in range(0, len(body_l), 4):
        words += body_l[k:k + 4]
        words += body_r[k:k + 4]
    stereo_align = 8 + len(body_l) + len(body_r)
    blob = _wav(0x11, 2, 8000, 4, stereo_align, bytes(words))
    rate, chn, got = wav_samples(blob)
    assert (rate, chn) == (8000, 2)
    want_l = ima_decode_reference(lb, mono_align)
    want_r = ima_decode_reference(rb, mono_align)
    n = len(got) // 2
    assert got[0::2].tolist() == want_l[:n]
    assert got[1::2].tolist() == want_r[:n]


def test_codec_properties_hypothesis():
    """Property sweeps: μ-law round-trip bound over the full int16
    domain; ADPCM dual-decoder equality on arbitrary signals."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        import pytest

        pytest.skip("hypothesis not installed")

    lut = _g711_lut("ulaw")

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-32768, max_value=32767))
    def ulaw_bound(x):
        b = ulaw_encode(x)
        d = int(lut[b])
        exp = (~b & 0x70) >> 4
        step = 1 << (exp + 3)
        assert abs(d - max(min(x, 32635), -32635)) <= step

    ulaw_bound()

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=2, max_size=200,
        )
    )
    def adpcm_dual(sig):
        arr = np.array(sig, dtype=np.int16)
        spb = len(arr)
        data = ima_encode(arr, spb)
        block_align = 4 + (spb - 1 + 7) // 8 * 4
        _, _, got = wav_samples(_wav(0x11, 1, 8000, 4, block_align, data))
        want = ima_decode_reference(data, block_align)
        assert got.tolist() == want[: len(got)]

    adpcm_dual()


# --------------------------------------------------------- MS ADPCM


def ms_encode(samples: np.ndarray, spb: int, pred: int = 1) -> bytes:
    """Independent mono MS ADPCM encoder: fixed predictor pair,
    nibble = clamp(round((s - prediction) / idelta)), state updated
    with the decoder rule."""
    from pg_pb3_ld_spark.functions.multimodal import _MS_ADAPT, _MS_COEFS

    c1, c2 = _MS_COEFS[pred]
    out = bytearray()
    i = 0
    while i < len(samples):
        chunk = [int(x) for x in samples[i:i + spb]]
        i += spb
        while len(chunk) < 2:
            chunk.append(0)
        s2, s1 = chunk[0], chunk[1]
        idelta = 256
        out.append(pred)
        out += struct.pack("<hhh", idelta, s1, s2)
        nibbles = []
        for s in chunk[2:]:
            p = s1 * c1 + s2 * c2
            p = -((-p) // 256) if p < 0 else p // 256
            n = max(-8, min(7, int(round((s - p) / idelta))))
            v = max(-32768, min(32767, p + n * idelta))
            nibbles.append(n & 0x0F)
            s2, s1 = s1, v
            idelta = max(16, (_MS_ADAPT[n & 0x0F] * idelta) >> 8)
        if len(nibbles) % 2:
            nibbles.append(0)
        for k in range(0, len(nibbles), 2):
            out.append((nibbles[k] << 4) | nibbles[k + 1])
    return bytes(out)


def ms_decode_reference(data: bytes, block_align: int) -> list[int]:
    """Second mono decoder, structurally different (functional state
    tuple), for dual-implementation comparison."""
    from pg_pb3_ld_spark.functions.multimodal import _MS_ADAPT, _MS_COEFS

    out: list[int] = []
    for b0 in range(0, len(data) - 6, block_align):
        blk = data[b0:b0 + block_align]
        pred = blk[0]
        idelta, s1, s2 = struct.unpack("<hhh", blk[1:7])
        c1, c2 = _MS_COEFS[pred]
        out += [s2, s1]
        state = (s1, s2, idelta)
        for byte in blk[7:]:
            for nib in (byte >> 4, byte & 0x0F):
                s1_, s2_, d = state
                p = s1_ * c1 + s2_ * c2
                p = -((-p) // 256) if p < 0 else p // 256
                sn = nib - 16 if nib >= 8 else nib
                v = max(-32768, min(32767, p + sn * d))
                out.append(v)
                state = (v, s1_, max(16, (_MS_ADAPT[nib] * d) >> 8))
    return out


def test_ms_adpcm_engine_matches_independent_decoder():
    sig = _sine(3 * 500 + 123, amp=11000, period=41.0)
    spb = 500
    for pred in (0, 1, 4):
        data = ms_encode(sig, spb, pred=pred)
        block_align = 7 + (spb - 2 + 1) // 2
        rate, chn, got = wav_samples(
            _wav(0x02, 1, 8000, 4, block_align, data)
        )
        want = ms_decode_reference(data, block_align)
        assert (rate, chn) == (8000, 1)
        assert got.tolist() == want[: len(got)], f"pred={pred}"


def test_ms_adpcm_tracks_the_signal():
    sig = _sine(1002, amp=10000, period=61.0)
    data = ms_encode(sig, 1002, pred=0)  # pair (256,0): s ≈ s1
    block_align = 7 + 500
    _, _, got = wav_samples(_wav(0x02, 1, 8000, 4, block_align, data))
    dec = got[: len(sig)].astype(np.float64)
    ref = sig.astype(np.float64)
    corr = np.corrcoef(dec[50:], ref[50:len(dec)])[0, 1]
    assert corr > 0.99, corr


def test_ms_adpcm_custom_coef_pairs_from_fmt():
    """Coefficient pairs supplied in the fmt extra bytes override the
    built-ins — pair 0 here is deliberately NOT the standard (256,0)."""
    from pg_pb3_ld_spark.functions.multimodal import _MS_ADAPT

    sig = _sine(66, amp=5000)
    # encode with custom pair (128, 128)
    c1, c2 = 128, 128
    chunk = [int(x) for x in sig]
    s2, s1, idelta = chunk[0], chunk[1], 256
    body = bytearray([0]) + struct.pack("<hhh", idelta, s1, s2)
    nibbles = []
    for s in chunk[2:]:
        p = s1 * c1 + s2 * c2
        p = -((-p) // 256) if p < 0 else p // 256
        n = max(-8, min(7, int(round((s - p) / idelta))))
        v = max(-32768, min(32767, p + n * idelta))
        nibbles.append(n & 0x0F)
        s2, s1 = s1, v
        idelta = max(16, (_MS_ADAPT[n & 0x0F] * idelta) >> 8)
    if len(nibbles) % 2:
        nibbles.append(0)
    for k in range(0, len(nibbles), 2):
        body.append((nibbles[k] << 4) | nibbles[k + 1])
    block_align = len(body)
    # fmt extra: cbSize, samplesPerBlock, numCoef=1, pair (128,128)
    fmt = struct.pack(
        "<HHIIHH", 2, 1, 8000, 8000, block_align, 4
    ) + struct.pack("<HHH", 8, 66, 1) + struct.pack("<hh", c1, c2)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
    )
    _, _, got = wav_samples(blob)
    # decoded stream must track the signal tightly (wrong pairs would
    # diverge immediately at this amplitude)
    dec = got[: len(sig)].astype(np.float64)
    corr = np.corrcoef(dec[10:], sig[10:len(dec)].astype(np.float64))[0, 1]
    assert corr > 0.99, corr


def test_ms_adpcm_stereo_nibble_interleave():
    """Stereo MS ADPCM: channel-interleaved header fields, then one
    nibble per sample alternating channels (high nibble = ch0)."""
    from pg_pb3_ld_spark.functions.multimodal import _MS_ADAPT, _MS_COEFS

    left = _sine(202, amp=8000, period=23.0)
    right = _sine(202, amp=4000, period=47.0)
    c1, c2 = _MS_COEFS[0]

    def chan_nibbles(sig):
        chunk = [int(x) for x in sig]
        s2, s1, idelta = chunk[0], chunk[1], 256
        nibs, vals = [], [s2, s1]
        for s in chunk[2:]:
            p = s1 * c1 + s2 * c2
            p = -((-p) // 256) if p < 0 else p // 256
            n = max(-8, min(7, int(round((s - p) / idelta))))
            v = max(-32768, min(32767, p + n * idelta))
            nibs.append(n & 0x0F)
            vals.append(v)
            s2, s1 = s1, v
            idelta = max(16, (_MS_ADAPT[n & 0x0F] * idelta) >> 8)
        return nibs, vals

    ln, lv = chan_nibbles(left)
    rn, rv = chan_nibbles(right)
    hdr = bytearray([0, 0])  # predictor index per channel
    hdr += struct.pack("<hh", 256, 256)                    # idelta
    hdr += struct.pack("<hh", int(left[1]), int(right[1]))  # sample1
    hdr += struct.pack("<hh", int(left[0]), int(right[0]))  # sample2
    body = bytearray(hdr)
    for k in range(len(ln)):
        body.append((ln[k] << 4) | rn[k])
    blob = _wav(0x02, 2, 8000, 4, len(body), bytes(body))
    rate, chn, got = wav_samples(blob)
    assert (rate, chn) == (8000, 2)
    n = len(got) // 2
    assert got[0::2].tolist() == lv[:n]
    assert got[1::2].tolist() == rv[:n]


def test_audio_segments_semantics(spark):
    from pg_pb3_ld_spark.functions.multimodal import audio_segments

    rows = [
        # media 1: silence, loud, loud, silence → 3 segments
        (1, 0, 0, 0), (1, 1, 100, 900), (1, 2, 200, 850), (1, 3, 300, 0),
        # media 2: all loud → 1 segment
        (2, 0, 0, 40), (2, 1, 100, 50),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, t_ms int, rms int"
    )
    got = sorted(
        map(tuple, audio_segments(df, rms_threshold=1).collect())
    )
    assert got == [
        (1, 1, False, 0, 0, 1, 0),
        (1, 2, True, 1, 2, 2, 100),
        (1, 3, False, 3, 3, 1, 300),
        (2, 1, True, 0, 1, 2, 0),
    ]


def test_audio_segments_threshold_boundary(spark):
    from pg_pb3_ld_spark.functions.multimodal import audio_segments

    df = spark.createDataFrame(
        [(1, 0, 0, 9), (1, 1, 100, 10)],
        "media_id long, frame_idx int, t_ms int, rms int",
    )
    got = {r["seg_idx"]: r for r in
           audio_segments(df, rms_threshold=10).collect()}
    assert not got[1]["active"] and got[2]["active"]
