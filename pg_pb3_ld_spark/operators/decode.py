"""D1 — frame split + protobuf decode as a Spark operator.

``decode_changes`` lifts the vectorized codec
(``pg_pb3_ld_spark.pb3.decoder``) into a ``mapInArrow`` stage: the
only Python in the whole pipeline.  Input is the raw-ingest DataFrame
``(frame_seq long, lsn long, frame binary)``; output is the generic
change DataFrame (FIXTURES.md §2) with the FieldSetDescriptions as
parallel array columns — the same struct-of-arrays shape the wire
uses (``decoder/pg_pb3_ld.h:29-40``), so nothing is re-shaped in
Python.  Everything downstream (typed projection, transaction gating,
fold, merge) is JVM-side Catalyst work.

Scale notes: one frame ≈ ≤4 MiB (producer flush target,
``decoder/pg_pb3_ld.c:96-97``); Arrow batches are kept to
``arrow_batch_frames`` frames so executor memory stays bounded
regardless of upstream batch sizing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.pb3.decoder import decode_frame_arrow

GENERIC_CHANGE_DDL = (
    "frame_seq long, lsn long, offset_idx int, op string, "
    "schema_name string, table_name string, table_oid long, "
    "key_names array<string>, key_values array<binary>, "
    "key_nulls array<boolean>, key_oids array<long>, "
    "key_formats array<boolean>, "
    "new_names array<string>, new_values array<binary>, "
    "new_nulls array<boolean>, new_oids array<long>, "
    "new_formats array<boolean>"
)


def decode_changes(
    frames_df: DataFrame,
    config: EngineConfig | None = None,
    arrow_batch_frames: int = 256,
) -> DataFrame:
    """Raw frames DataFrame → generic change DataFrame (vectorized)."""
    cfg = config or EngineConfig()

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            seqs = batch.column("frame_seq").to_numpy(zero_copy_only=False)
            lsns = batch.column("lsn").to_numpy(zero_copy_only=False)
            frames = batch.column("frame")
            # sub-chunk so a pathological upstream batch can't blow
            # memory: decode ≤ arrow_batch_frames frames at a time
            for lo in range(0, n, arrow_batch_frames):
                hi = min(lo + arrow_batch_frames, n)
                out = decode_frame_arrow(
                    frames.slice(lo, hi - lo),
                    lsns[lo:hi].astype(np.int64),
                    seqs[lo:hi].astype(np.int64),
                    cfg,
                )
                if out.num_rows:
                    yield out

    return frames_df.mapInArrow(fn, GENERIC_CHANGE_DDL)
