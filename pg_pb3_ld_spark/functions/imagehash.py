"""Perceptual image fingerprints + hamming-bucketed image near-dup.

The multimodal analog of MinHash/LSH text dedup: crawl-scale training
sets carry the same image re-encoded, resized, or watermarked millions
of times, and exact byte/md5 dedup misses all of it.  The standard
first-line fix is a *difference hash* (dHash): decode → integer luma →
exact block-mean downsample to a 8×9 grid → 64 horizontal-gradient
bits.  Near-identical images land within a small hamming distance.

Everything here is deterministic EXACT-integer arithmetic (the repo
discipline: no float means, no library resamplers), so the same image
hashes identically on any engine, partitioning, or cluster size — and
a DuckDB oracle can replay the full chain (PNG encode → zlib →
unfilter → luma → block means → gradient bits → packed hash) by pure
arithmetic on synthesized fixtures (see ``q_image_dhash``).

Candidate generation NEVER does all-pairs: the 64-bit hash splits into
4 disjoint 16-bit chunks; by pigeonhole, hamming(a,b) ≤ 3 ⇒ at least
one chunk is byte-equal, so a (chunk_id, chunk_value) bucket self-join
finds every qualifying pair.  Degenerate buckets (flat images — all-
zero gradients) are capped with the same surfaced-drop discipline as
:func:`pg_pb3_ld_spark.functions.dedup.cap_buckets`.

Reference parity note: the reference (johto/pg_pb3_ld) has no media
operators — this extends the engine along the training-data-pipeline
axis (multimodal dedup), same as functions/dedup.py does for text.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.dedup import cap_buckets, dropped_buckets

GRID_ROWS = 8
GRID_COLS = 9  # 8 horizontal gradients per row → 64 bits

DHASH_SCHEMA = "media_id long, hash_hi long, hash_lo long, error string"


def luma(px: np.ndarray) -> np.ndarray:
    """Exact integer luma (h, w) int64 from (h, w, ch) uint8.

    ch≥3 → (77·c0 + 150·c1 + 29·c2) >> 8 (BT.601 integer weights; sums
    to 256 so equal channels map to themselves exactly).  ch∈{1,2} →
    channel 0 (gray / gray+alpha).  Channel order is as the decoder
    yields it (PNG: RGB; BMP path: BGR — dedup only needs the SAME
    deterministic map on both sides of a pair, and re-encodes of one
    image arrive through one format's decoder in practice).
    """
    p = px.astype(np.int64)
    if p.ndim == 2:
        return p
    if p.shape[2] >= 3:
        return (77 * p[:, :, 0] + 150 * p[:, :, 1] + 29 * p[:, :, 2]) >> 8
    return p[:, :, 0]


def block_means(gray: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Exact integer block means on the (rows × cols) grid.

    Cell (r, c) covers pixel rows [r·h//rows, (r+1)·h//rows) × cols
    [c·w//cols, (c+1)·w//cols) — the floor-boundary partition — and
    its value is sum // count (floor).  Pure integer: bit-identical
    everywhere, and replayable in SQL for exact-multiple fixtures.
    """
    h, w = gray.shape
    if h < rows or w < cols:
        raise ValueError(f"image {h}x{w} smaller than {rows}x{cols} grid")
    rb = (np.arange(rows) * h) // rows
    cb = (np.arange(cols) * w) // cols
    sums = np.add.reduceat(np.add.reduceat(gray, rb, axis=0), cb, axis=1)
    rcnt = np.diff(np.append(rb, h))
    ccnt = np.diff(np.append(cb, w))
    return sums // (rcnt[:, None] * ccnt[None, :])


def dhash64(px: np.ndarray) -> tuple[int, int]:
    """(hash_hi, hash_lo): two NON-NEGATIVE 32-bit halves of the
    64-bit dHash (bit r·8+c = 1 iff grid[r][c+1] > grid[r][c]; lo =
    bits 0..31 i.e. grid rows 0..3, hi = bits 32..63).

    Two bigints instead of one avoid the bit-63 sign trap: a single
    packed int64 flips negative whenever the bottom-right gradient is
    set, and signed-overflow semantics differ across engines — two
    unsigned halves compare, chunk, and popcount identically in Spark
    and DuckDB.
    """
    g = block_means(luma(px), GRID_ROWS, GRID_COLS)
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)  # (8, 8)
    weights = 1 << np.arange(8, dtype=np.int64)
    packed = bits @ weights  # one byte per grid row
    lo = int(
        packed[0] | (packed[1] << 8) | (packed[2] << 16) | (packed[3] << 24)
    )
    hi = int(
        packed[4] | (packed[5] << 8) | (packed[6] << 16) | (packed[7] << 24)
    )
    return hi, lo


def image_dhash(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(media_id, hash_hi, hash_lo, error) via ONE Arrow-batched
    mapInPandas stage (decode + hash fused — pixels never cross a
    stage boundary).  Per-row failures land in ``error``, never raise
    (the corpus-scan discipline: one corrupt blob must not kill a
    100 TB job)."""
    from pg_pb3_ld_spark.functions.multimodal import decode_image_pixels

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los, errs = [], [], []
            for blob in pdf[blob_col]:
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    hi, lo = dhash64(decode_image_pixels(bytes(blob)))
                    his.append(hi)
                    los.append(lo)
                    errs.append(None)
                except Exception as exc:  # per-row capture
                    his.append(0)
                    los.append(0)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "hash_hi": pd.Series(his, dtype="int64"),
                    "hash_lo": pd.Series(los, dtype="int64"),
                    "error": pd.Series(errs, dtype="object"),
                }
            )

    return df.mapInPandas(fn, DHASH_SCHEMA)


def _chunks_expr() -> "F.Column":
    """The 4 disjoint 16-bit chunks of (hash_hi, hash_lo) as an array
    (pure codegen — shiftright + mask, no Python)."""
    lo, hi = F.col("hash_lo"), F.col("hash_hi")
    mask = F.lit(0xFFFF)
    return F.array(
        lo.bitwiseAND(mask),
        F.shiftright(lo, 16).bitwiseAND(mask),
        hi.bitwiseAND(mask),
        F.shiftright(hi, 16).bitwiseAND(mask),
    )


def hash_chunks(hashes: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, chunk_id, ck, hash_hi, hash_lo) band rows — 4 per image.

    The hashes ride along so pair verification is a projection on the
    self-join output (popcount of xor), not a second join back to the
    hash table — band rows are 5 small ints, the classic space-for-
    shuffle trade at 4 rows per image.
    """
    return hashes.select(
        id_col,
        "hash_hi",
        "hash_lo",
        F.posexplode(_chunks_expr()).alias("chunk_id", "ck"),
    )


def hamming_expr(ahi, alo, bhi, blo) -> "F.Column":
    """popcount(a⊕b) over the two 32-bit halves (codegen bit_count)."""
    return F.bit_count(ahi.bitwiseXOR(bhi)) + F.bit_count(alo.bitwiseXOR(blo))


def neardup_hash_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b, dist) pairs with hamming ≤ threshold
    over ANY 64-bit fingerprint split as (hash_hi, hash_lo) — shared
    by image dHash and audio energy-contour fingerprints (the hamming
    machinery is signature-agnostic).

    COMPLETE for ``max_hamming ≤ 3`` (pigeonhole over the 4 chunks);
    larger thresholds would need more/overlapping chunks, so they are
    rejected loudly rather than silently missing pairs.  Degenerate
    buckets (e.g. the all-zero hash of flat images) are capped via the
    shared :func:`cap_buckets`; use :func:`neardup_dropped_buckets` to
    surface what was excluded.
    """
    if max_hamming > 3:
        raise ValueError(
            "4-chunk pigeonhole is only complete for max_hamming <= 3; "
            "got %d" % max_hamming
        )
    bands = cap_buckets(
        hash_chunks(hashes, id_col), ["chunk_id", "ck"], max_bucket_size
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming_expr(
                F.col("a.hash_hi"),
                F.col("a.hash_lo"),
                F.col("b.hash_hi"),
                F.col("b.hash_lo"),
            ).alias("dist"),
        )
        .where(F.col("dist") <= max_hamming)
        .distinct()
    )
    return pairs


# the image-named alias (the original entry point; audio reuses the
# generic name above)
neardup_image_pairs = neardup_hash_pairs


def neardup_dropped_buckets(
    hashes: DataFrame, id_col: str = "media_id", max_bucket_size: int = 0
) -> DataFrame:
    """(chunk_id, ck, bucket_size) for capped-away hash buckets —
    the surfaced record (never drop silently at scale)."""
    return dropped_buckets(
        hash_chunks(hashes, id_col), ["chunk_id", "ck"], max_bucket_size
    )
