"""Baseline JPEG decoder — pure stdlib + numpy (no PIL/libjpeg).

Supports the baseline sequential DCT process (the overwhelmingly
common JFIF case): 8-bit precision, Huffman entropy coding, 1 or 3
components, 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart markers.
Progressive, arithmetic-coded, 12-bit, and CMYK streams are rejected
with ``ValueError`` (captured per-row by the media extractor).

Decode path per the public ITU-T T.81 spec:

* segment walk: DQT (quant tables, zigzag order), SOF0 (geometry +
  per-component sampling), DHT (canonical Huffman tables), SOS, with
  0xFF00 byte-stuffing removed from the entropy segment;
* per MCU, per component block: DC = pred + EXTEND(RECEIVE(t)),
  AC run/size with EOB/ZRL, zigzag→natural order, dequantize;
* 8×8 inverse DCT as two float64 matrix multiplies with the
  orthonormal DCT-II basis, +128 level shift, clip to [0,255];
* chroma upsampled nearest-neighbor; YCbCr→RGB per JFIF.

The Huffman bit-reader is plain Python — fine for the fixture-sized
images the sandbox decodes; production feature extraction at 100 TB
would push this behind the same mapInPandas operator on executors
with a native codec installed (the Spark plumbing is identical).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def idct2(block: np.ndarray) -> np.ndarray:
    """8×8 inverse DCT (float64, deterministic)."""
    return _A.T @ block @ _A


class _Huff:
    """Canonical Huffman table: (length, code) → symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def byte_align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """EXTEND per T.81 F.2.2.1: map RECEIVE bits to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(blob: bytes) -> np.ndarray:
    """(h, w, ncomp) uint8 pixels from a baseline JFIF stream."""
    if len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    sof = None
    restart_interval = 0
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them, or the walk reads a fill byte as the
        # marker and the next real marker byte as half a length field
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers with NO length field
            pos += 2
            continue
        if pos + 4 > len(blob):
            break
        seglen = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        body = blob[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[0:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({
                    "id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq,
                })
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}) — "
                "baseline sequential only"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                table = _Huff(counts, body[i + 17:i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = table
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            pos = pos + 2 + seglen
            return _decode_scan(
                blob, pos, sof, scan, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(blob, pos, sof, scan, qt, dc_tabs, ac_tabs, dri):
    if sof is None:
        raise ValueError("JPEG SOS before SOF")
    # strip byte stuffing; stop at a non-RST marker
    out = bytearray()
    markers = []  # positions in `out` where RST markers occurred
    i = pos
    while i < len(blob):
        b = blob[i]
        if b == 0xFF and i + 1 < len(blob):
            nxt = blob[i + 1]
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                markers.append(len(out))
                i += 2
                continue
            break
        # includes the FINAL byte of a stream that ends without EOI
        # (the old `< len - 1` bound silently dropped it); a trailing
        # lone 0xFF is kept too — entropy data always stuffs FF as
        # FF 00, so it can only be padding and the bit reader stops at
        # MCU count regardless
        out.append(b)
        i += 1
    comps = sof["comps"]
    h, w = sof["h"], sof["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    by_id = {s["id"]: s for s in scan}
    reader = _BitReader(bytes(out))
    preds = [0] * len(comps)
    mcu_count = 0
    next_marker = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart: seek to the data after the next RST marker
                # (recorded as positions in the stripped stream) and
                # reset the DC predictors
                if next_marker < len(markers):
                    reader.pos = markers[next_marker]
                    reader.bit = 0
                    next_marker += 1
                else:
                    reader.byte_align()
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                sc = by_id[comp["id"]]
                dct = dc_tabs.get(sc["td"])
                act = ac_tabs.get(sc["ta"])
                q = qt.get(comp["tq"])
                if dct is None or act is None or q is None:
                    raise ValueError("JPEG missing Huffman/quant table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coeff = np.zeros(64, dtype=np.int64)
                        coeff[ZIGZAG] = zz
                        block = idct2(coeff.reshape(8, 8) * q) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution, crop, stack
    chans = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        chans.append(p[:h, :w])
    img = np.stack(chans, axis=-1)
    if len(comps) == 3:  # JFIF YCbCr → RGB
        y = img[..., 0]
        cb = img[..., 1] - 128.0
        cr = img[..., 2] - 128.0
        img = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def decode_jpeg(blob: bytes) -> tuple[int, int, int, int]:
    """Summary features (width, height, mean_pixel, bits) — the
    media-extractor contract shape (matches decode_bmp/decode_png)."""
    px = decode_jpeg_pixels(blob)
    h, w, ch = px.shape
    return (w, h, int(px.mean()), 8 * ch)
