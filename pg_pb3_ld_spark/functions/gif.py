"""GIF codec (pure Python/numpy — real format, no external libs).

GIF87a/89a: logical screen + palette(s) + LZW-compressed image
frames, optionally animated (one image descriptor per frame with
graphic-control extensions).  Everything is public-spec (W3C/
CompuServe GIF89a specification); LZW here is the GIF variant —
LSB-first variable-width codes (3..12 bits) inside 255-byte
sub-blocks, dictionary reset via CLEAR.

GIF is lossless (palette-indexed), so — like FLAC — golden tests are
exact round-trips, and frame features are arithmetically derivable
by the SQL oracle.  Decode handles: global + local color tables,
interlaced images (4-pass), frame offsets within the logical screen,
transparency index, disposal methods 0/1/2, animated multi-frame
streams, loud ``ValueError`` on malformed structure.

Scale shape: per-row map (``mapInPandas``) like the rest of the
codec family — no shuffle; the CPython LZW loop shares the disclosed
native-hatch story (``PB3LD_NATIVE_CODECS``).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

__all__ = ["decode_gif", "encode_gif", "gif_frame_sample"]


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, variable width, CLEAR/END codes)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code beyond table")
        out += entry
        prev = entry
        # table grew: widen at 2^width (max 12 bits per spec)
        if len(table) == 1 << width and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW produced {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # widen AFTER emitting the code that filled the previous width
        if next_code - 1 == 1 << width and width < 12:
            width += 1
        if next_code == (1 << 12) + 1:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for row in range(start, h, step):
            out[row] = idx[src]
            src += 1
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_gif(blob: bytes):
    """Decode a (possibly animated) GIF → ``(width, height, frames)``
    where each frame is ``(delay_cs, rgb)`` — the composited logical
    screen as a (h, w, 3) uint8 array after that frame is drawn.
    Raises ``ValueError`` loudly on malformed structure."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream (missing GIF8xa magic)")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(
            blob[pos:pos + 3 * size], dtype=np.uint8
        ).reshape(size, 3)
        pos += 3 * size

    screen = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        screen[:] = gct[bg]
    frames = []
    delay_cs = 0
    transparent = -1
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(blob):
                raise ValueError("GIF sub-blocks truncated")
            ln = blob[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            chunks.append(blob[p:p + ln])
            p += ln

    while True:
        if pos >= len(blob):
            raise ValueError("GIF missing trailer")
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = blob[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:
                gpacked, delay_cs = body[0], struct.unpack(
                    "<H", body[1:3]
                )[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = body[3] if gpacked & 0x01 else -1
            continue
        if marker != 0x2C:
            raise ValueError(f"unknown GIF block 0x{marker:02x}")
        left, top, fw, fh, ipacked = struct.unpack(
            "<HHHHB", blob[pos:pos + 9]
        )
        pos += 9
        table = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                blob[pos:pos + 3 * size], dtype=np.uint8
            ).reshape(size, 3)
            pos += 3 * size
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code = blob[pos]
        pos += 1
        data, pos = read_subblocks(pos)
        raw = _lzw_decode(data, min_code, fw * fh)
        idx = np.frombuffer(raw, dtype=np.uint8).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max() >= len(table):
            raise ValueError("GIF pixel index beyond color table")
        prev = screen.copy()
        region = screen[top:top + fh, left:left + fw]
        rgb = table[idx]
        if transparent >= 0:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append((delay_cs, screen.copy()))
        if disposal == 2:  # restore background
            bgcol = table[bg] if bg < len(table) else 0
            screen[top:top + fh, left:left + fw] = bgcol
        elif disposal == 3:  # restore previous
            screen = prev
        disposal = 0
        transparent = -1
    return w, h, frames


# ---------------------------------------------------------------------------
# Encoder (real LZW writer — exact round-trip fixtures + sink side)
# ---------------------------------------------------------------------------

def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Write an animated GIF89a: ``frames`` are (h, w) uint8 index
    arrays into ``palette`` (n, 3).  Lossless — decoding returns the
    exact palette colors at the exact indices."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    n = len(palette)
    bits = max((n - 1).bit_length(), 1)
    size_field = bits - 1
    padded = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1) << 4 | size_field,
                       0, 0)
    pal = np.zeros((padded, 3), dtype=np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    # netscape loop extension (structurally real animated GIF)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must match the logical screen")
        out += b"\x21\xf9\x04" + bytes([0]) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"
        ipacked = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        idx = np.asarray(fr, dtype=np.uint8)
        if interlace:
            rows = [
                row for start, step in _INTERLACE_PASSES
                for row in range(start, h, step)
            ]
            idx = idx[rows]
        min_code = max(bits, 2)
        out.append(min_code)
        data = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

GIF_FRAME_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, delay_cs int, "
    "mean_r int, mean_g int, mean_b int, error string"
)


def gif_frame_sample(df, id_col: str = "media_id", blob_col: str = "blob"):
    """Decode animated GIF blobs → one row per frame with per-channel
    integer means (floor) over the composited logical screen.
    Per-row map, errors captured per row — same discipline as the
    audio/video samplers."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                mid = int(mid) if pd.notna(mid) else -1
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    w, h, frames = decode_gif(bytes(blob))
                    for k, (delay, rgb) in enumerate(frames):
                        flat = rgb.reshape(-1, 3).astype(np.int64)
                        means = flat.sum(axis=0) // flat.shape[0]
                        recs.append({
                            "media_id": mid, "frame_idx": k,
                            "width": w, "height": h,
                            "delay_cs": int(delay),
                            "mean_r": int(means[0]),
                            "mean_g": int(means[1]),
                            "mean_b": int(means[2]),
                            "error": None,
                        })
                except Exception as exc:
                    recs.append({
                        "media_id": mid, "frame_idx": -1, "width": 0,
                        "height": 0, "delay_cs": 0, "mean_r": 0,
                        "mean_g": 0, "mean_b": 0,
                        "error": f"{type(exc).__name__}: {exc}",
                    })
            yield pd.DataFrame(recs)

    return df.mapInPandas(fn, GIF_FRAME_SCHEMA)
