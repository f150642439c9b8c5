"""AVI/MJPEG video containers as first-class opaque-blob columns.

The reference treats every payload as schemaless bytes on the wire
(``/root/reference/decoder/pg_pb3_ld.c:300-334`` ships whole tuples
without interpreting user columns); a training-data pipeline built on
that stream needs to *open* media blobs at scale.  Round 4 closed the
raster (BMP/PNG/JPEG incl. progressive) and audio (PCM/G.711/ADPCM)
families; this module closes the disclosed "video containers" gap for
the one video family decodable without ffmpeg-class native code:
**Motion-JPEG in an AVI (RIFF) container** — each frame is a complete
baseline/progressive JPEG stream, so frame extraction is pure
container walking and frame decode reuses ``functions/jpeg.py``.

Scale shape: ``sample_video_frames`` is a per-row ``mapInPandas`` map
— no shuffle, executor memory bounded by the Arrow batch, per-row
errors captured so one corrupt container cannot kill a 100 TB scan
(same discipline as ``resize_media`` / ``sample_audio_frames``).
Perceptual video codecs (H.264/VP9/AV1) remain loud stubs behind the
``PB3LD_NATIVE_CODECS`` hatch — interframe prediction genuinely needs
a native decoder.
"""

from __future__ import annotations

import struct
from typing import Iterator, TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# RIFF/AVI container walk (read side)
# ---------------------------------------------------------------------------

def avi_mjpeg_frames(blob: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse a RIFF/AVI container and return
    ``(rate, scale, width, height, [frame_jpeg_bytes, ...])`` where
    fps = rate/scale (the AVI 'strh' convention).

    Real container walk: even-padded chunks, LIST nesting (including
    the OpenDML ``rec `` grouping inside ``movi``), header parse from
    ``avih``/``strh``/``strf``, video frames from ``00dc``/``00db``
    chunks.  Raises ``ValueError`` on structural corruption — callers
    in the Spark operator capture that per row.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    riff_len = struct.unpack("<I", blob[4:8])[0]
    end = min(len(blob), 8 + riff_len)

    rate = scale = width = height = 0
    usec_per_frame = 0
    frames: list[bytes] = []

    def walk(pos: int, stop: int, in_movi: bool) -> None:
        nonlocal rate, scale, width, height, usec_per_frame
        while pos + 8 <= stop:
            fourcc = blob[pos:pos + 4]
            size = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > stop:
                raise ValueError(
                    f"chunk {fourcc!r} overruns its parent "
                    f"({body_end} > {stop})"
                )
            if fourcc == b"LIST":
                ltype = blob[body_start:body_start + 4]
                walk(
                    body_start + 4, body_end,
                    in_movi or ltype in (b"movi", b"rec "),
                )
            elif fourcc == b"avih":
                usec_per_frame = struct.unpack(
                    "<I", blob[body_start:body_start + 4]
                )[0]
                width, height = struct.unpack(
                    "<II", blob[body_start + 32:body_start + 40]
                )
            elif fourcc == b"strh":
                if blob[body_start:body_start + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<II", blob[body_start + 20:body_start + 28]
                    )
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(blob[body_start:body_end])
            # chunks are padded to even length (RIFF rule)
            pos = body_end + (size & 1)

    walk(12, end, False)
    if not frames:
        raise ValueError("no video frames in movi list")
    if rate == 0 or scale == 0:
        # fall back to avih microseconds/frame
        if usec_per_frame:
            rate, scale = 1_000_000, usec_per_frame
        else:
            rate, scale = 25, 1
    return rate, scale, width, height, frames


# ---------------------------------------------------------------------------
# RIFF/AVI writer (fixture/materialization side — real container, no ffmpeg)
# ---------------------------------------------------------------------------

def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int,
    rate: int = 25, scale: int = 1,
) -> bytes:
    """Minimal but structurally complete AVI-MJPEG writer: hdrl
    (avih + strl{strh,strf}), movi with even-padded ``00dc`` chunks,
    and an ``idx1`` index — enough that the read walk above and any
    standard RIFF tool agree on the frame list."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = int(1_000_000 * scale / rate) if rate else 0
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, scale, rate, 0,
                      len(frames), 0, -1, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b""
    idx_entries = []
    for fb in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_body), len(fb)))
        movi_body += chunk(b"00dc", fb)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


# ---------------------------------------------------------------------------
# Flat-block grayscale JPEG encoder (oracle-exact fixture frames)
# ---------------------------------------------------------------------------

# Annex-K example Huffman tables (public ITU-T T.81 constants)
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_SYMS = [
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


def _canon_codes(counts: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def encode_jpeg_gray_flat(block_values: "np.ndarray") -> bytes:
    """Grayscale baseline JPEG whose 8×8 blocks are each a CONSTANT
    value (``block_values`` is the (bh, bw) grid of those values,
    0..255), quantized with an all-ones table.

    Why this exists: with q=1 a flat block is DC-only and the DC
    coefficient ``8·(v−128)`` is an exact integer, so the full decode
    (Huffman → dequant → IDCT → clip) reproduces ``v`` EXACTLY —
    giving video-query oracles that can recompute every decoded pixel
    arithmetically in SQL while still exercising the real entropy
    decoder and IDCT.  Not a general-purpose encoder (the general one,
    with real quant tables and AC coefficients, lives in the test
    suite as the independent golden encoder)."""
    bv = np.asarray(block_values, dtype=np.int64)
    bh, bw = bv.shape
    h, w = bh * 8, bw * 8

    dc_codes = _canon_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canon_codes(_AC_COUNTS, _AC_SYMS)
    eob_code, eob_len = ac_codes[0x00]

    wtr = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            dc = 8 * (int(bv[by, bx]) - 128)
            diff = dc - prev_dc
            prev_dc = dc
            mag = abs(diff)
            t = mag.bit_length()
            code, ln = dc_codes[t]
            wtr.put(code, ln)
            if t:
                bits = diff if diff >= 0 else diff + (1 << t) - 1
                wtr.put(bits, t)
            wtr.put(eob_code, eob_len)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMS)
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Spark operator: frame sampling over AVI-MJPEG blobs
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, t_ms int, width int, height int, "
    "mean_pixel int, corner00 int, error string"
)


def sample_video_frames(
    df: "DataFrame",
    n_frames: int = 4,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> "DataFrame":
    """Frame-sample over AVI-MJPEG blobs: walk the RIFF container →
    pick ``n_frames`` equally-spaced frames → decode each through the
    real JPEG path (``decode_jpeg_pixels`` — baseline or progressive)
    → per-frame summary features.  One output row per sampled frame;
    per-row errors captured (one corrupt container must not kill a
    100 TB scan).  Embarrassingly parallel: no shuffle."""
    import pandas as pd

    from pg_pb3_ld_spark.functions.jpeg import decode_jpeg_pixels

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                # convert before the try: a null id must not make the
                # error row itself throw (see resize_media)
                mid = int(mid) if pd.notna(mid) else -1
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    rate, scale, _, _, frames = avi_mjpeg_frames(bytes(blob))
                    n = len(frames)
                    for k in range(n_frames):
                        orig = k * n // n_frames
                        px = decode_jpeg_pixels(frames[orig])
                        recs.append({
                            "media_id": mid,
                            "frame_idx": k,
                            "t_ms": orig * 1000 * scale // rate,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "mean_pixel": int(px.mean()),
                            "corner00": int(px[0, 0, 0]),
                            "error": None,
                        })
                except Exception as exc:
                    recs.append({
                        "media_id": mid, "frame_idx": -1, "t_ms": 0,
                        "width": 0, "height": 0, "mean_pixel": 0,
                        "corner00": 0,
                        "error": f"{type(exc).__name__}: {exc}",
                    })
            yield pd.DataFrame(recs)

    return df.mapInPandas(fn, VIDEO_FRAME_SCHEMA)


def scene_cuts(
    frames: "DataFrame", threshold: int = 10, id_col: str = "media_id",
) -> "DataFrame":
    """Shot-boundary detection over decoded frame features — the
    classic mean-intensity-difference detector: a frame opens a new
    scene when its mean luma jumps by ≥ ``threshold`` against the
    previous frame; the first frame always starts a scene.

    Input is :func:`sample_video_frames` output (or any
    (id, frame_idx, t_ms, mean_pixel) relation).  The lag runs in a
    per-video window — partitioned by ``id_col``, ordered by the
    bounded ``frame_idx`` — so the shuffle key is the video id and no
    global sort exists; at 100 TB this is the same shape as
    sessionization.  Richer detectors (histogram distance, block
    motion) drop into the same frame-feature relation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    prev = F.lag("mean_pixel").over(w)
    diff = F.abs(F.col("mean_pixel") - prev)
    return frames.select(
        id_col, "frame_idx", "t_ms", "mean_pixel",
        diff.alias("diff"),
        (prev.isNull() | (diff >= threshold)).alias("is_cut"),
    )
