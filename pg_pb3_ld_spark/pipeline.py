"""End-to-end apply pipeline (SURVEY.md §3.4).

``raw frames → [hwm filter] → mapInArrow decode (D1) → txn assembly +
commit gating (D3) → typed projection (D2, pure JVM) → per-key fold
(D4, map-side combining agg) → COW MERGE + lineage + watermark commit
(D5/D6) with additive schema evolution (D7)``.

The high-watermark filter runs on the *frame* table before decode —
cheapest possible exactly-once: replayed frames are dropped by a
pushdown-friendly ``lsn > hwm`` predicate against the parquet scan,
so re-ingesting an already-applied range costs one metadata-pruned
scan and nothing else.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.operators.decode import decode_changes
from pg_pb3_ld_spark.operators.fold import fold_changes
from pg_pb3_ld_spark.operators.project import (
    observed_wire_columns,
    project_typed,
)
from pg_pb3_ld_spark.operators.txn import assign_txn_ids, gate_committed
from pg_pb3_ld_spark.sinks.store import SnapshotStore


@dataclass
class IngestPipeline:
    spark: SparkSession
    store: SnapshotStore
    config: EngineConfig = field(default_factory=EngineConfig)
    salt: int = 0                  # D8 explicit two-phase fold knob
    evolve_schema: bool = True     # D7

    def apply_frames(self, frames_df: DataFrame, batch_id: int = 0) -> dict:
        """Apply one batch of raw frames; returns metrics.

        Idempotent: frames at-or-below the store watermark are
        filtered out, so replaying any prefix/suffix of the stream
        (including the whole stream) converges to the same snapshot.
        """
        hwm_lsn, hwm_frame = self.store.hwm()
        fresh = frames_df.where(
            (F.col("lsn") > hwm_lsn)
            | ((F.col("lsn") == hwm_lsn) & (F.col("frame_seq") > hwm_frame))
        )

        # decode runs Python; several downstream actions (txn prefix
        # sum, schema probe, merge) would each re-run it — persist the
        # decoded batch once (spills to disk if it outgrows memory)
        decoded = decode_changes(fresh, self.config).persist()
        try:
            changes = assign_txn_ids(decoded)
            gated = gate_committed(changes)

            schema = self.store.schema
            if self.evolve_schema:
                observed = observed_wire_columns(gated)
                schema = self.store.evolved_schema(observed)

            typed = project_typed(gated, schema)
            folded = fold_changes(typed, schema, salt=self.salt)
            return self.store.merge(folded, schema=schema, batch_id=batch_id)
        finally:
            decoded.unpersist()
