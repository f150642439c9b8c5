"""Arithmetic-coded sequential JPEG (SOF9) — ITU-T T.81 Annexes D/F.

Closes the disclosed "arithmetic JPEG" gap from round 4: real crawls
contain arithmetic-coded JPEGs (rare but present since patents
expired), and the reference's byte-transparent wire format
(``/root/reference/decoder/pg_pb3_ld.c:300-334``) means media blobs
arrive undecoded — opening them is this engine's job.

What is implemented, all from the PUBLIC T.81 spec:

* the QM-coder probability estimation state machine (Table D.3 —
  113 states of (Qe, NMPS, NLPS, SWITCH), transcribed from the spec,
  plus the non-adaptive equiprobable bin used for AC signs);
* interval arithmetic with MPS in the lower subinterval and the
  spec's conditional MPS/LPS exchange (F.2.2.2/D.1.5);
* the marker-compatible byte feed: a data byte contributes 8 bits,
  a byte FOLLOWING 0xFF contributes 7 (its stuffed top bit is 0),
  0xFF followed by a value > 0x8F is a marker — the decoder stops
  consuming and pads with 1-bits (T.81 F.2.2.5);
* the sequential DCT statistical models (F.2.2.1/F.2.2.2): per-DC-
  table 49-bin areas with the L/U difference-classification
  conditioning contexts, per-AC-table 245-bin areas with the Kx
  split, X-chain magnitude categories and +14 magnitude-bit
  contexts; DAC (0xCC) conditioning parsing with the spec defaults
  (L=0, U=1, Kx=5).

Register-transfer caveat (disclosed): the coder here normalizes the
code window as a 16-bit ``Cx`` fed bit-at-a-time rather than T.81's
exact 32-bit C/CT byte mechanics.  The two are the same arithmetic
map on the same effective bit stream, but initial-window alignment
against third-party encoders has not been verifiable in this sandbox
(no arithmetic-JPEG sample exists here and no codec library is
installed) — so the goldens pin this implementation the same way the
progressive-JPEG ones do: an INDEPENDENT in-test encoder (exact
big-integer interval construction, not a mirror of the decoder loop)
plus pixel-equality against the baseline Huffman decode of the same
quantized coefficients.

Scale note: like the other pure-Python codec cores this is the
per-row map inside ``mapInPandas`` — no shuffle, error-isolated —
and rides the ``PB3LD_NATIVE_CODECS`` hatch for 100-TB media scans.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.81 Table D.3 — Qe estimation state machine.
# Each row: (Qe, NMPS, NLPS, SWITCH).
# ---------------------------------------------------------------------------

QE_TABLE: list[tuple[int, int, int, int]] = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
]

# the non-adaptive equiprobable bin (AC sign decisions): state 113,
# transitions to itself, never switches
FIXED_STATE = len(QE_TABLE)
_QE = [q for q, _, _, _ in QE_TABLE] + [0x5A1D]
_NMPS = [n for _, n, _, _ in QE_TABLE] + [FIXED_STATE]
_NLPS = [n for _, _, n, _ in QE_TABLE] + [FIXED_STATE]
_SWITCH = [s for _, _, _, s in QE_TABLE] + [0]


# ---------------------------------------------------------------------------
# Effective bit feed (decoder side): 8 bits per byte, 7 after 0xFF,
# marker (0xFF then > 0x8F) stops the stream; 1-bits pad past the end.
# ---------------------------------------------------------------------------


class _BitFeed:
    __slots__ = ("data", "pos", "end", "acc", "nbits", "prev_ff")

    def __init__(self, data: bytes, pos: int, end: int) -> None:
        self.data = data
        self.pos = pos
        self.end = end
        self.acc = 0
        self.nbits = 0
        self.prev_ff = False

    def _feed(self) -> None:
        d, p = self.data, self.pos
        if p >= self.end:
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = d[p]
        if self.prev_ff:
            if b > 0x8F:          # marker: stop consuming, pad 1s
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            # stuffed byte: top bit is a stuffed 0 — 7 payload bits
            self.pos = p + 1
            self.prev_ff = False
            self.acc = (self.acc << 7) | (b & 0x7F)
            self.nbits += 7
            return
        self.pos = p + 1
        self.prev_ff = b == 0xFF
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def take(self, n: int) -> int:
        while self.nbits < n:
            self._feed()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


class ArithDecoder:
    """QM decoder: MPS in the lower subinterval, conditional
    exchange per T.81 F.2.2.2, Qe state machine per Table D.3.
    Contexts are single bytes in a ``bytearray``: ``mps<<7 | index``.
    """

    __slots__ = ("feed", "a", "cx")

    def __init__(self, data: bytes, pos: int, end: int) -> None:
        self.feed = _BitFeed(data, pos, end)
        self.cx = self.feed.take(16)
        self.a = 0x10000

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QE[idx]
        a = self.a - qe
        cx = self.cx
        if cx < a:
            if a & 0x8000:            # no renorm, no estimation update
                self.a = a
                return mps
            # MPS renorm path (conditional exchange)
            if a < qe:
                d = 1 - mps
                if _SWITCH[idx]:
                    mps = d
                stats[i] = (mps << 7) | _NLPS[idx]
            else:
                d = mps
                stats[i] = (mps << 7) | _NMPS[idx]
        else:
            cx -= a
            a = qe
            # LPS path (conditional exchange)
            if self.a - qe < qe:
                d = mps
                stats[i] = (mps << 7) | _NMPS[idx]
            else:
                d = 1 - mps
                if _SWITCH[idx]:
                    mps = d
                stats[i] = (mps << 7) | _NLPS[idx]
        take = self.feed.take
        while not a & 0x8000:
            a <<= 1
            cx = (cx << 1) | take(1)
        self.a = a
        self.cx = cx
        return d


class ArithEncoder:
    """Exact big-integer interval encoder producing streams the
    decoder above accepts — deliberately NOT a mirror of the decoder
    loop: it tracks the full-precision interval base and derives the
    code bytes at flush, so it is an independent construction of the
    same T.81 arithmetic (the golden-pair discipline used for the
    progressive-JPEG encoder)."""

    __slots__ = ("base", "a", "nbits")

    def __init__(self) -> None:
        self.base = 0
        self.a = 0x10000
        self.nbits = 16          # decoder's initial window

    def code(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QE[idx]
        a_mps = self.a - qe
        # which symbol does the LOWER region decode to?
        exchange = a_mps < qe
        low_sym = (1 - mps) if exchange else mps
        if bit == low_sym:
            # lower region: base unchanged, interval a_mps
            self.a = a_mps
            if a_mps & 0x8000:
                # fast path: matches the decoder's no-update branch
                # ONLY when this was the plain-MPS decode; if the
                # lower region decodes to the exchanged symbol the
                # interval is < 0x8000 by construction, so this
                # branch is exactly bit==mps, no estimation update
                return
            if exchange:
                if _SWITCH[idx]:
                    mps = 1 - mps
                stats[i] = (mps << 7) | _NLPS[idx]
            else:
                stats[i] = (mps << 7) | _NMPS[idx]
        else:
            # upper region: base += a_mps, interval qe
            self.base += a_mps
            self.a = qe
            if exchange:
                stats[i] = (mps << 7) | _NMPS[idx]
            else:
                if _SWITCH[idx]:
                    mps = 1 - mps
                stats[i] = (mps << 7) | _NLPS[idx]
        while not self.a & 0x8000:
            self.a <<= 1
            self.base <<= 1
            self.nbits += 1

    def flush(self) -> bytes:
        """Emit the interval base as the code stream, applying the
        T.81 stuffing rule (7 payload bits in any byte after 0xFF)."""
        bits = [
            (self.base >> (self.nbits - 1 - k)) & 1
            for k in range(self.nbits)
        ]
        out = bytearray()
        bi = 0
        while bi < len(bits):
            width = 7 if (out and out[-1] == 0xFF) else 8
            chunk = bits[bi:bi + width]
            chunk += [0] * (width - len(chunk))   # zero-pad the tail
            v = 0
            for b in chunk:
                v = (v << 1) | b
            out.append(v)
            bi += width
        # a trailing 0xFF would swallow the following marker's 0xFF
        # in SOME third-party feeders; drop it (zero-padding means the
        # decoder just pads 1-bits sooner — past the last decision)
        while out and out[-1] == 0xFF:
            out.pop()
        return bytes(out)


# ---------------------------------------------------------------------------
# Sequential DCT statistical model (T.81 F.2.2.1/F.2.2.2)
# ---------------------------------------------------------------------------

DC_STAT_BINS = 49
AC_STAT_BINS = 245


def classify_dc_diff(m: int, sign: int, low: int, up: int) -> int:
    """Next block's DC conditioning category from this diff's
    magnitude CATEGORY power ``m`` (0, 1, 2, 4, ... as decoded) —
    T.81 F.1.4.4.1.2: zero / small± / large± with the L/U bounds."""
    if m < ((1 << low) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def decode_dc_diff(dec, stats: bytearray, ctx: int, cond: tuple[int, int]):
    """Returns (diff, next_ctx)."""
    low, up = cond
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    m = dec.decode(stats, ctx + 2 + sign)
    st = ctx + 2 + sign
    if m:
        st = 20
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            st += 1
    nxt = classify_dc_diff(m, sign, low, up)
    v = m
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        if dec.decode(stats, st):
            v |= mm
    v += 1
    return (-v if sign else v), nxt


def decode_ac_block(dec, stats: bytearray, fixed: bytearray, kx: int, zz):
    """Fill zigzag AC coefficients 1..63 of ``zz`` in place."""
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(stats, st):       # SE: end of block
            break
        while dec.decode(stats, st + 1) == 0:   # S0: zero at k
            st += 3
            k += 1
            if k > 63:
                raise ValueError("arith AC index overflow")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            if dec.decode(stats, st):
                v |= mm
        v += 1
        zz[k] = -v if sign else v
        k += 1


def _find_scan_end(blob: bytes, pos: int) -> int:
    """Index of the marker terminating an arithmetic entropy segment
    (0xFF followed by anything > 0x8F that is not RSTn — RSTs belong
    to the segment when DRI is active and are skipped by the MCU
    loop)."""
    i = pos
    n = len(blob)
    while i + 1 < n:
        if blob[i] == 0xFF and blob[i + 1] > 0x8F:
            if not (0xD0 <= blob[i + 1] <= 0xD7):
                return i
            i += 2
            continue
        i += 1
    return n


def decode_scan_arith(blob, pos, sof, scan, qt, dc_cond, ac_cond, dri):
    """Sequential arithmetic scan → (h, w, ncomp) uint8 pixels.
    MCU walk mirrors the baseline Huffman path; reconstruction
    (de-zigzag, dequant, batched IDCT, upsample, YCbCr) is shared
    with it via ``jpeg._reconstruct_from_zz``."""
    from pg_pb3_ld_spark.functions.jpeg import _reconstruct_from_zz

    comps = sof["comps"]
    h, w = sof["h"], sof["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {s["id"]: s for s in scan}

    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    for comp in comps:
        sc = by_id[comp["id"]]
        dc_stats.setdefault(sc["td"], bytearray(DC_STAT_BINS))
        ac_stats.setdefault(sc["ta"], bytearray(AC_STAT_BINS))
    fixed = bytearray([FIXED_STATE])

    end = _find_scan_end(blob, pos)
    dec = ArithDecoder(blob, pos, end)
    dc_ctx = [0] * len(comps)
    preds = [0] * len(comps)
    comp_zz: list[list[list[int]]] = [[] for _ in comps]
    mcu_count = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart: skip to just past the next RST marker,
                # re-init the coder, statistics and DC state.  Start
                # one byte BEFORE the feed position: the padding walk
                # may already have consumed the marker's 0xFF as a
                # data byte (spec behavior — 1-bit padding begins with
                # it), leaving pos ON the Dn byte.  Entropy data can
                # never contain FF followed by >0x8F (stuffing), so
                # backing up cannot false-match inside data.
                i = max(dec.feed.pos - 1, pos)
                while i + 1 < end and not (
                    blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
                ):
                    i += 1
                if i + 1 >= end:
                    raise ValueError("arith scan missing RST marker")
                dec = ArithDecoder(blob, i + 2, end)
                for st in dc_stats.values():
                    st[:] = bytes(len(st))
                for st in ac_stats.values():
                    st[:] = bytes(len(st))
                fixed[0] = FIXED_STATE
                dc_ctx = [0] * len(comps)
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                sc = by_id[comp["id"]]
                dst = dc_stats[sc["td"]]
                ast = ac_stats[sc["ta"]]
                kx = ac_cond.get(sc["ta"], 5)
                cond = dc_cond.get(sc["td"], (0, 1))
                for _by in range(comp["v"]):
                    for _bx in range(comp["h"]):
                        zz = [0] * 64
                        diff, dc_ctx[ci] = decode_dc_diff(
                            dec, dst, dc_ctx[ci], cond
                        )
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        decode_ac_block(dec, ast, fixed, kx, zz)
                        comp_zz[ci].append(zz)
            mcu_count += 1
    return _reconstruct_from_zz(sof, qt, comp_zz, mcus_x, mcus_y)
