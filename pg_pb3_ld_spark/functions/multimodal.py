"""Multimodal column plumbing for training-data pipelines.

Images / audio / video ride through the engine as opaque ``binary``
columns with typed metadata (the same way the wire format treats
every PostgreSQL value as opaque output-function bytes,
``decoder/fsd.c:150-199``).  The Spark-side plumbing — schema,
Arrow-batched ``mapInPandas`` signature, per-batch shaping,
partitioning — is real and tested; the actual codec calls (PIL /
ffmpeg / torchaudio) are **stubbed** behind ``_decode_image`` /
``_decode_audio`` because the sandbox has no media libraries: they
raise ``NotImplementedError`` unless ``deterministic_fake=True``, in
which case they produce seedless, reproducible pseudo-features pure
ly from the bytes (so tests and SQL oracles can pin the plumbing
end-to-end).

Scale notes: feature extraction is embarrassingly parallel — the
operator never shuffles; it maps Arrow batches in place and keeps
executor memory bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch``.  Decode failures are captured per row
(``error`` column), not raised, so one corrupt blob can't kill a
100 TB scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, n_bytes int, "
    "sample0 int, sample1 int, sample2 int, sample3 int, "
    "digest string, error string"
)


def _decode_image(blob: bytes, deterministic_fake: bool):
    """Stub for image decode (PIL.Image.open → resize → embed)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding needs PIL/torchvision — not in this sandbox"
        )
    return _fake_features(blob)


def _decode_audio(blob: bytes, deterministic_fake: bool):
    """Stub for audio decode (ffmpeg/torchaudio → frames → features)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio decoding needs ffmpeg/torchaudio — not in this sandbox"
        )
    return _fake_features(blob)


def _fake_features(blob: bytes):
    """Deterministic stand-in features: 4 byte-samples at quartile
    offsets — cheap, order-stable, and SQL-oracle-expressible."""
    n = len(blob)
    if n == 0:
        return (0, 0, 0, 0)
    return tuple(int(blob[(n - 1) * q // 4]) for q in range(4))


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    kind_col: str = "kind",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over opaque media blobs.

    Input: any DataFrame with (id, kind∈{image,audio}, blob binary).
    Output: MEDIA_SCHEMA rows; per-row failures land in ``error``.
    """
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            kinds = pdf[kind_col]
            out = {
                "media_id": pdf[id_col].astype("int64"),
                "kind": kinds,
                "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0).astype("int32"),
            }
            samples = np.zeros((len(pdf), 4), dtype="int32")
            digests = []
            errors = []
            for i, (blob, kind) in enumerate(zip(blobs, kinds)):
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    decode = _decode_image if kind == "image" else _decode_audio
                    samples[i] = decode(bytes(blob), deterministic_fake)
                    digests.append(hashlib.md5(bytes(blob)).hexdigest())
                    errors.append(None)
                except Exception as exc:  # per-row capture, never raise
                    digests.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            for q in range(4):
                out[f"sample{q}"] = samples[:, q]
            out["digest"] = pd.Series(digests, dtype="object")
            out["error"] = pd.Series(errors, dtype="object")
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, MEDIA_SCHEMA)
