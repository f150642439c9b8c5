"""GIF codec tests.

Golden discipline: besides exact encoder→decoder round-trips
(lossless format), the decoder is checked against a HAND-CONSTRUCTED
bitstream — the LZW code sequence for a tiny image derived on paper
and packed by an independent LSB-first packer — so the decoder and
encoder cannot share a correlated bug.  Compositing semantics
(offsets, transparency, disposal) get their own fixtures.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pg_pb3_ld_spark.functions.gif import (
    decode_gif,
    encode_gif,
    gif_frame_sample,
)


def pack_lsb(codes):
    """Independent LSB-first packer for (code, width) pairs."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_wrap(w, h, palette, image_blocks):
    bits = max((len(palette) - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    for blk in image_blocks:
        out += blk
    out.append(0x3B)
    return bytes(out)


def image_block(left, top, w, h, min_code, lzw_bytes, interlace=False):
    out = bytearray(b"\x2c")
    out += struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw_bytes), 255):
        chunk = lzw_bytes[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ----- hand-built golden -------------------------------------------


def test_hand_built_lzw_stream():
    """2×2 image, indices [[1,2],[2,1]], min code size 2.

    Manual LZW walk: CLEAR(4); emit 1, add (1,2)=6; emit 2, add
    (2,2)=7; emit 2, add (2,1)=8 → table hits 8 = 2^3 so width
    becomes 4; emit 1 @4 bits; END(5) @4 bits."""
    codes = [(4, 3), (1, 3), (2, 3), (2, 3), (1, 4), (5, 4)]
    palette = np.array(
        [[0, 0, 0], [10, 20, 30], [40, 50, 60], [70, 80, 90]],
        dtype=np.uint8,
    )
    blob = gif_wrap(2, 2, palette, [image_block(0, 0, 2, 2, 2,
                                                pack_lsb(codes))])
    w, h, frames = decode_gif(blob)
    assert (w, h, len(frames)) == (2, 2, 1)
    expect = palette[np.array([[1, 2], [2, 1]])]
    assert np.array_equal(frames[0][1], expect)


def test_hand_built_repeat_code():
    """The cScSc case: code == len(table) ⇒ entry = prev + prev[0].

    Indices [0,1,0,1,0]: CLEAR(2... min code 2 ⇒ clear=4,end=5);
    emit 0, add (0,1)=6; emit 1, add (1,0)=7; then cur='01' matches 6,
    nxt='010' new: emit 6, add=8 (width→4); remaining '0' → emit 0;
    END."""
    codes = [(4, 3), (0, 3), (1, 3), (6, 3), (0, 4), (5, 4)]
    palette = np.array([[1, 2, 3], [4, 5, 6], [0, 0, 0], [0, 0, 0]],
                       dtype=np.uint8)
    blob = gif_wrap(5, 1, palette, [image_block(0, 0, 5, 1, 2,
                                                pack_lsb(codes))])
    _, _, frames = decode_gif(blob)
    expect = palette[np.array([[0, 1, 0, 1, 0]])]
    assert np.array_equal(frames[0][1], expect)


# ----- round-trips --------------------------------------------------


def test_roundtrip_animated_exact():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
    frames = [rng.integers(0, 32, (16, 20)).astype(np.uint8)
              for _ in range(4)]
    blob = encode_gif(frames, pal, delay_cs=12)
    w, h, out = decode_gif(blob)
    assert (w, h, len(out)) == (20, 16, 4)
    for fr, (delay, rgb) in zip(frames, out):
        assert delay == 12
        assert np.array_equal(rgb, pal[fr])


def test_roundtrip_interlaced_and_two_colors():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    fr = (np.add.outer(np.arange(19), np.arange(7)) % 2).astype(np.uint8)
    _, _, out = decode_gif(encode_gif([fr], pal, interlace=True))
    assert np.array_equal(out[0][1], pal[fr])


def test_roundtrip_large_crosses_dict_reset():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    fr = rng.integers(0, 256, (120, 200)).astype(np.uint8)  # 24k px
    _, _, out = decode_gif(encode_gif([fr], pal))
    assert np.array_equal(out[0][1], pal[fr])


# ----- compositing: offsets, transparency, disposal ----------------


def test_partial_frame_offsets_and_transparency():
    pal = np.array([[9, 9, 9], [100, 0, 0], [0, 100, 0]], dtype=np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)
    blob1 = encode_gif([base], pal)
    # craft a second frame by hand: 2×2 patch at (1,1), index 2 with
    # index 0 transparent
    from pg_pb3_ld_spark.functions.gif import _lzw_encode

    patch = np.array([[2, 0], [0, 2]], dtype=np.uint8)
    gce = b"\x21\xf9\x04" + bytes([0x01]) + struct.pack("<H", 4) + \
        bytes([0]) + b"\x00"  # transparent index 0
    img = image_block(1, 1, 2, 2, 2, _lzw_encode(patch.tobytes(), 2))
    blob = bytes(blob1[:-1]) + gce + img + b"\x3b"
    _, _, frames = decode_gif(blob)
    assert len(frames) == 2
    final = frames[1][1]
    # patch pixels with index 2 drawn; transparent holes keep base
    assert tuple(final[1, 1]) == (0, 100, 0)
    assert tuple(final[2, 2]) == (0, 100, 0)
    assert tuple(final[1, 2]) == (9, 9, 9)
    assert tuple(final[2, 1]) == (9, 9, 9)
    assert frames[1][0] == 4  # delay from the GCE


# ----- loud failures ------------------------------------------------


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOPE" + b"\x00" * 20)
    pal = np.array([[0, 0, 0], [1, 1, 1]], dtype=np.uint8)
    good = encode_gif([np.zeros((3, 3), dtype=np.uint8)], pal)
    with pytest.raises(ValueError):
        decode_gif(good[:-5])  # truncated
    # pixel index beyond the (padded, 2-entry) color table → loud
    blob = gif_wrap(1, 1, np.array([[5, 5, 5]], dtype=np.uint8), [
        image_block(0, 0, 1, 1, 2, pack_lsb([(4, 3), (3, 3), (5, 3)]))
    ])
    with pytest.raises(ValueError, match="beyond color table"):
        decode_gif(blob)


# ----- Spark operator ----------------------------------------------


def test_gif_frame_sample_operator(spark):
    pal = np.array([[i * 30, 200 - i * 20, i * 10 + 3] for i in range(8)],
                   dtype=np.uint8)
    rows = []
    expect = {}
    for mid in range(3):
        frames = []
        for f in range(2):
            a, b = (mid + f) % 8, (mid + 2 * f + 1) % 8
            fr = np.empty((8, 16), dtype=np.uint8)
            fr[:, :8] = a
            fr[:, 8:] = b
            frames.append(fr)
            expect[(mid, f)] = tuple(
                (int(pal[a][c]) * 64 + int(pal[b][c]) * 64) // 128
                for c in range(3)
            )
        rows.append((mid, bytearray(encode_gif(frames, pal, delay_cs=5))))
    rows.append((77, bytearray(b"garbage")))
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    df = spark.createDataFrame(rows, StructType([
        StructField("media_id", LongType()),
        StructField("blob", BinaryType()),
    ]))
    out = gif_frame_sample(df).collect()
    bad = [r for r in out if r.error is not None]
    assert len(bad) == 1 and bad[0].media_id == 77
    good = [r for r in out if r.error is None]
    assert len(good) == 6
    for r in good:
        assert (r.width, r.height, r.delay_cs) == (16, 8, 5)
        assert (r.mean_r, r.mean_g, r.mean_b) == expect[
            (r.media_id, r.frame_idx)
        ]
