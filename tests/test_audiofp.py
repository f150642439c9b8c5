"""Audio energy-contour fingerprint tests: exact-integer framing,
pure-Python reference hash, gain-shift robustness vs distinct-clip
separation, codec round-trips (PCM vs G.711 of the same clip), and
the shared hamming machinery through real WAV decode."""

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.audiofp import (
    audio_dhash64,
    audio_fingerprint,
    frame_energies,
    neardup_audio_pairs,
)


def _ref_hash(samples):
    n = len(samples)
    bounds = [(k * n) // 65 for k in range(65)] + [n]
    e = [
        sum(abs(int(s)) for s in samples[bounds[k] : bounds[k + 1]])
        for k in range(65)
    ]
    hi = lo = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            if k < 32:
                lo |= 1 << k
            else:
                hi |= 1 << (k - 32)
    return hi, lo


def _clip(seed, n=780):
    i = np.arange(n)
    fr = i // 12
    env = ((fr * fr + 1) * (seed * 31 + 7)) % 997
    return (env * (((i * 29) % 41) - 20)) % 2003 - 1001


def test_frame_energies_exact():
    s = np.array([1, -2, 3, -4] * 65, dtype=np.int64)
    e = frame_energies(s)
    assert e.shape == (65,)
    assert e.sum() == np.abs(s).sum()


def test_hash_matches_pure_python_reference():
    for seed in (0, 3, 11):
        s = _clip(seed)
        assert audio_dhash64(s) == _ref_hash(s)


def test_uneven_frame_boundaries():
    s = _clip(2, n=801)  # 801 not divisible by 65
    assert audio_dhash64(s) == _ref_hash(s)


def test_too_short_raises():
    with pytest.raises(ValueError, match="samples"):
        audio_dhash64(np.arange(10))


def test_gain_shift_preserves_hash():
    s = _clip(5)
    assert audio_dhash64(s) == audio_dhash64(s * 3)  # L1 scales uniformly


def test_distinct_clips_distinct_hashes():
    assert audio_dhash64(_clip(1)) != audio_dhash64(_clip(2))


def test_codec_roundtrip_small_distance():
    """The same clip through PCM and through G.711 mu-law (lossy)
    should stay within a small hamming distance — the property that
    makes the fingerprint useful for cross-encode dedup."""
    from pg_pb3_ld_spark.functions.multimodal import (
        _g711_lut,
        encode_wav,
        encode_wav_g711,
        wav_samples,
    )

    s = _clip(7)
    # nearest-level mu-law compand (quantize each sample to the
    # closest decodable level) -> raw G.711 payload
    lut = _g711_lut("ulaw")
    order = np.argsort(lut)
    pos = np.searchsorted(lut[order], s)
    pos = np.clip(pos, 1, 255)
    lower, upper = lut[order][pos - 1], lut[order][np.minimum(pos, 255)]
    pick = np.where(np.abs(s - lower) <= np.abs(upper - s), pos - 1, pos)
    payload = order[np.clip(pick, 0, 255)].astype(np.uint8).tobytes()
    _, _, pcm = wav_samples(encode_wav(8000, 1, s))
    _, _, ulaw = wav_samples(encode_wav_g711(8000, 1, payload))
    a, b = audio_dhash64(pcm), audio_dhash64(ulaw)
    d = bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
    assert d <= 3


def test_fingerprint_real_wav_and_error_capture(spark):
    from pg_pb3_ld_spark.functions.multimodal import encode_wav

    good = encode_wav(8000, 1, _clip(4))
    rows = [(1, bytearray(good)), (2, bytearray(b"junk")), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {r.media_id: r for r in audio_fingerprint(df).collect()}
    hi, lo = audio_dhash64(_clip(4))
    assert (out[1].hash_hi, out[1].hash_lo) == (hi, lo)
    assert out[1].error is None
    assert out[2].error is not None and out[3].error is not None


def test_stereo_uses_channel_zero(spark):
    from pg_pb3_ld_spark.functions.multimodal import encode_wav

    left = _clip(6)
    right = np.zeros_like(left)
    inter = np.empty(2 * len(left), dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(8000, 2, inter)))],
        "media_id long, blob binary",
    )
    row = audio_fingerprint(df).collect()[0]
    assert (row.hash_hi, row.hash_lo) == audio_dhash64(left)


def test_neardup_pairs_through_real_decode(spark):
    from pg_pb3_ld_spark.functions.multimodal import encode_wav

    base = _clip(9)
    variant = base.copy()
    variant[120:132] += 900  # bump one frame: flips <= 2 bits
    far = _clip(10)
    rows = [
        (1, bytearray(encode_wav(8000, 1, base))),
        (2, bytearray(encode_wav(8000, 1, variant))),
        (3, bytearray(encode_wav(8000, 1, far))),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    fps = audio_fingerprint(df)
    pairs = {(r.doc_a, r.doc_b) for r in neardup_audio_pairs(fps).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs
