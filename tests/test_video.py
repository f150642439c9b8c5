"""AVI/MJPEG container + frame-sample operator tests.

Golden discipline matches the raster/audio families: the container
round-trips through an independent walk of the writer's output, and
frame DECODE is checked against the general in-test JPEG encoder from
``test_jpeg_real`` (independent implementation), plus the flat-block
path whose decode is arithmetically exact.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.jpeg import decode_jpeg_pixels
from pg_pb3_ld_spark.functions.video import (
    avi_mjpeg_frames,
    encode_avi_mjpeg,
    encode_jpeg_gray_flat,
    sample_video_frames,
)

from test_jpeg_real import _reference_reconstruct, encode_jpeg_gray


def _structured(h, w, seed):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 7 + seed * 11) % 256).astype(np.uint8)


# ----- container round-trip ----------------------------------------


def test_container_roundtrip_preserves_frames():
    frames = [bytes([i]) * (10 + i) for i in range(5)]  # odd+even lengths
    blob = encode_avi_mjpeg(frames, 16, 8, rate=30, scale=1)
    rate, scale, w, h, out = avi_mjpeg_frames(blob)
    assert (rate, scale) == (30, 1)
    assert (w, h) == (16, 8)
    assert out == frames  # padding bytes must NOT leak into frames


def test_container_odd_sized_chunk_padding():
    # single 3-byte frame: chunk body padded to 4; parser must honor
    # the declared size, not the padded extent
    blob = encode_avi_mjpeg([b"abc"], 8, 8)
    _, _, _, _, out = avi_mjpeg_frames(blob)
    assert out == [b"abc"]


def test_container_rec_list_nesting():
    """OpenDML groups frames inside LIST('rec ') sublists of movi."""
    frames = [b"frameA!", b"frameB"]
    blob = bytearray(encode_avi_mjpeg(frames, 8, 8))
    # hand-build a movi with a rec -nested chunk and splice it in:
    # easiest is to build a fresh container manually
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    base = encode_avi_mjpeg([b"x"], 8, 8)
    # find hdrl LIST and reuse it verbatim
    hstart = base.index(b"LIST")
    hsize = struct.unpack("<I", base[hstart + 4:hstart + 8])[0]
    hdrl = base[hstart:hstart + 8 + hsize + (hsize & 1)]
    movi = lst(
        b"movi",
        chunk(b"00dc", frames[0]) + lst(b"rec ", chunk(b"00dc", frames[1])),
    )
    payload = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
    _, _, _, _, out = avi_mjpeg_frames(bytes(blob))
    assert out == frames


def test_container_rejects_garbage_and_overrun():
    with pytest.raises(ValueError):
        avi_mjpeg_frames(b"\x00" * 64)
    # truncated chunk: declared size overruns the RIFF extent
    good = encode_avi_mjpeg([b"abcdef"], 8, 8)
    with pytest.raises(ValueError):
        avi_mjpeg_frames(good[:-10] )


def test_container_no_frames_raises():
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    payload = b"AVI " + chunk(b"LIST", b"movi")
    blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
    with pytest.raises(ValueError):
        avi_mjpeg_frames(blob)


# ----- flat-block fixture encoder: decode must be EXACT -------------


def test_flat_block_jpeg_decode_exact():
    bv = np.array([[0, 37], [200, 255]])
    blob = encode_jpeg_gray_flat(bv)
    px = decode_jpeg_pixels(blob)
    assert px.shape == (16, 16, 1)
    for by in range(2):
        for bx in range(2):
            block = px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, 0]
            assert (block == bv[by, bx]).all(), (by, bx)


def test_flat_block_jpeg_many_values_exact():
    vals = np.arange(256).reshape(16, 16)
    px = decode_jpeg_pixels(encode_jpeg_gray_flat(vals))
    # every block reproduces its constant exactly
    got = px[:, :, 0].reshape(16, 8, 16, 8).mean(axis=(1, 3))
    assert (got == vals).all()


# ----- golden: sampled frames vs independent general encoder --------


def test_frame_decode_matches_independent_encoder():
    """Frames produced by the INDEPENDENT Annex-K-table encoder from
    test_jpeg_real: the container walk must hand the decoder byte
    streams that decode identically to decoding the frame directly."""
    frames, refs = [], []
    for i in range(3):
        px = _structured(24, 16, i)
        blob, qblocks, (ph, pw) = encode_jpeg_gray(px.astype(np.float64))
        frames.append(blob)
        refs.append(_reference_reconstruct(qblocks, ph, pw, 24, 16))
    avi = encode_avi_mjpeg(frames, 16, 24, rate=10, scale=1)
    _, _, _, _, out = avi_mjpeg_frames(avi)
    for fb, ref in zip(out, refs):
        dec = decode_jpeg_pixels(fb)[:, :, 0].astype(np.int64)
        assert np.abs(dec - ref).max() <= 1


# ----- Spark operator ------------------------------------------------


def _mk_blob_df(spark, rows):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("blob", BinaryType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_sample_video_frames_end_to_end(spark):
    rows = []
    expect = {}
    for did in [1, 2, 7]:
        frames = []
        for f in range(8):
            bv = np.array([
                [(did * 7 + f * 31) % 256, (did * 7 + f * 31 + 50) % 256],
                [(did * 7 + f * 31 + 100) % 256,
                 (did * 7 + f * 31 + 150) % 256],
            ])
            frames.append(encode_jpeg_gray_flat(bv))
            expect[(did, f)] = bv
        rows.append((did, bytearray(encode_avi_mjpeg(
            frames, 16, 16, rate=4, scale=1))))
    out = sample_video_frames(_mk_blob_df(spark, rows), n_frames=4)
    got = {(r.media_id, r.frame_idx): r for r in out.collect()}
    assert len(got) == 12
    for (did, k), r in got.items():
        orig = k * 8 // 4
        bv = expect[(did, orig)]
        assert r.error is None
        assert (r.width, r.height) == (16, 16)
        assert r.t_ms == orig * 250
        assert r.corner00 == bv[0, 0]
        assert r.mean_pixel == int(bv.mean())


def test_sample_video_frames_error_rows(spark):
    good_frames = [encode_jpeg_gray_flat(np.array([[128]]))]
    rows = [
        (1, bytearray(encode_avi_mjpeg(good_frames, 8, 8))),
        (2, bytearray(b"not an avi at all")),
        (3, None),
    ]
    out = sample_video_frames(_mk_blob_df(spark, rows), n_frames=2)
    res = {r.media_id: r for r in out.collect() if r.error is not None}
    assert set(res) == {2, 3}
    ok = [r for r in out.collect() if r.error is None]
    assert {r.media_id for r in ok} == {1}
    # one frame sampled twice (n_total=1 < n_frames=2) — deterministic
    assert sorted(r.frame_idx for r in ok) == [0, 1]


def test_scene_cuts_semantics(spark):
    from pg_pb3_ld_spark.functions.video import scene_cuts

    rows = [
        # video 1: scenes [0,1,2][3]: jump of exactly 10 (>=) at 3
        (1, 0, 0, 100), (1, 1, 250, 103), (1, 2, 500, 97),
        (1, 3, 750, 107),
        # video 2: monotone drift below threshold: only frame 0 cuts
        (2, 0, 0, 50), (2, 1, 250, 55), (2, 2, 500, 60),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, t_ms int, mean_pixel int"
    )
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in scene_cuts(df, threshold=10).collect()
    }
    assert got[(1, 0)]["is_cut"] and got[(1, 0)]["diff"] is None
    assert not got[(1, 1)]["is_cut"] and got[(1, 1)]["diff"] == 3
    assert not got[(1, 2)]["is_cut"]
    assert got[(1, 3)]["is_cut"] and got[(1, 3)]["diff"] == 10
    assert got[(2, 0)]["is_cut"]
    assert not got[(2, 1)]["is_cut"] and not got[(2, 2)]["is_cut"]


def test_scene_cuts_plan_is_per_video_window(spark):
    from pg_pb3_ld_spark.functions.video import scene_cuts

    df = spark.createDataFrame(
        [(1, 0, 0, 10)], "media_id long, frame_idx int, t_ms int, "
        "mean_pixel int"
    )
    plan = scene_cuts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "SinglePartition" not in plan
