"""Audio fingerprints + hamming-bucketed audio near-dup.

The audio leg of multimodal dedup: speech/music corpora carry the same
clip re-encoded (PCM ↔ G.711 ↔ ADPCM), trimmed, or gain-shifted many
times.  A robust cheap fingerprint is the *energy contour* dHash: 65
equal time frames → exact-integer L1 energy per frame → 64 bits of
"did energy rise between consecutive frames".  Gain changes scale all
energies together (ordering-invariant), codec noise perturbs a few
bits — near-dups land within a small hamming distance.

Same discipline as :mod:`imagehash`: pure integer arithmetic (no
sqrt/float RMS — L1 energy is a bigint sum), the hash packs as two
non-negative 32-bit halves, and candidate pairs come from the SHARED
4×16-bit-chunk pigeonhole machinery
(:func:`pg_pb3_ld_spark.functions.imagehash.neardup_hash_pairs`) —
never all-pairs.

Reference parity note: johto/pg_pb3_ld has no media operators; this
extends the engine along the training-data-pipeline axis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

N_FRAMES = 65  # 64 consecutive-frame comparisons → 64 bits

FP_SCHEMA = "media_id long, hash_hi long, hash_lo long, error string"


def frame_energies(samples: np.ndarray, n_frames: int = N_FRAMES) -> np.ndarray:
    """Exact-integer L1 energy per frame: sum(|s|) over the floor-
    boundary partition of the sample vector into ``n_frames`` frames
    (frame k covers [k·n//F, (k+1)·n//F) — same convention as the
    image block grid)."""
    n = samples.shape[0]
    if n < n_frames:
        raise ValueError(f"{n} samples < {n_frames} frames")
    mags = np.abs(samples.astype(np.int64))
    bounds = (np.arange(n_frames) * n) // n_frames
    return np.add.reduceat(mags, bounds)


def audio_dhash64(samples: np.ndarray) -> tuple[int, int]:
    """(hash_hi, hash_lo): 64 energy-rise bits packed as two
    non-negative 32-bit halves (bit k = 1 iff e[k+1] > e[k])."""
    e = frame_energies(samples)
    bits = (e[1:] > e[:-1]).astype(np.int64)  # (64,)
    w32 = 1 << np.arange(32, dtype=np.int64)
    return int(bits[32:] @ w32), int(bits[:32] @ w32)


def audio_fingerprint(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(media_id, hash_hi, hash_lo, error) via ONE Arrow-batched
    mapInPandas stage — WAV container decode (all wav_samples codecs:
    PCM, G.711 μ/A-law, IMA/MS ADPCM) fused with the fingerprint;
    channel 0 of interleaved audio.  Per-row failures land in
    ``error``, never raise."""
    from pg_pb3_ld_spark.functions.multimodal import wav_samples

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los, errs = [], [], []
            for blob in pdf[blob_col]:
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    _rate, nch, samples = wav_samples(bytes(blob))
                    hi, lo = audio_dhash64(samples[::nch])
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

    return df.mapInPandas(fn, FP_SCHEMA)


def neardup_audio_pairs(
    fingerprints: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Audio near-dup pairs over the shared pigeonhole hamming join
    (see :func:`imagehash.neardup_hash_pairs` for the completeness
    guarantee and capping semantics)."""
    from pg_pb3_ld_spark.functions.imagehash import neardup_hash_pairs

    return neardup_hash_pairs(
        fingerprints, id_col, max_hamming, max_bucket_size
    )
