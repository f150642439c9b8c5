"""Kafka offset-resume semantics across a simulated rebalance
(VERDICT r4 #8) — brokerless, against a RECORDED topic in the exact
spark-sql-kafka output schema (key/value/topic/partition/offset/
timestamp/timestampType/headers).

The contract under test: a consumer commits the offset derived from
the SINK's applied watermark (hwm frame_seq + 1), not the delivered
position.  A micro-batch cut mid-transaction holds its uncommitted
tail back (commit gate), so committed < delivered; the consumer that
takes the partition over after a rebalance re-reads exactly the
held-back frames and the final table matches the generator oracle.
A crashed consumer that never committed re-delivers from its start —
the LSN watermark makes the replay idempotent (at-least-once delivery
+ idempotent apply = exactly once).
"""

from __future__ import annotations

import os

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream
from pg_pb3_ld_spark.pipeline import IngestPipeline
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore
from pg_pb3_ld_spark.sources.frames import (
    recorded_kafka_frames,
    write_kafka_recording,
)

CFG = EngineConfig(
    type_oids_mode="omit_nulls", formats_mode="disabled",
    binary_oid_ranges="20-23,1184",
)


def _stream_and_recording(tmpdir_path):
    # a tiny flush target makes transactions SPAN frames (the batcher
    # flushes mid-txn at the byte target, pg_pb3_ld.c:417-422), so a
    # record-count cut genuinely lands mid-transaction — the default
    # target flushes exactly at commits and would never hold back
    producer_cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
        wire_message_target_size=512,
    )
    stream = generate_stream(seed=23, n_convs=8, max_turns=5,
                             n_extra_txns=30, config=producer_cfg)
    rec = os.path.join(tmpdir_path, "topic.parquet")
    write_kafka_recording(stream.frames, rec, topic="pb3ld", partition=0)
    return stream, rec


def _state(store):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in store.read_table().collect()
    }


def _oracle_text(stream):
    return {k: v["text"] for k, v in stream.oracle.items()}


def _ends_with_commit(frame: bytes) -> bool:
    """Parse the wire header (varint(len) ++ kv pairs) and report
    whether the frame's LAST message is a COMMIT — i.e. the frame is a
    transaction boundary."""
    from pg_pb3_ld_spark.pb3 import wire

    def rv(b, i):
        v = s = 0
        while True:
            x = b[i]
            i += 1
            v |= (x & 0x7F) << s
            if not x & 0x80:
                return v, i
            s += 7

    hlen, i = rv(frame, 0)
    hdr = frame[i:i + hlen]
    j = 0
    last_t = None
    while j < len(hdr):
        key, j = rv(hdr, j)
        val, j = rv(hdr, j)
        if key >> 3 == wire.WHDR_TYPES:
            last_t = val
    return last_t == wire.WMSG_COMMIT


def _find_mid_txn_cut(stream):
    """A max_records cut whose last delivered frame is NOT a
    transaction boundary — forces the commit gate to hold frames
    back (transactions span frames via the tiny flush target)."""
    n = len(stream.frames)
    for k in range((2 * n) // 5, n - 1):
        if not _ends_with_commit(stream.frames[k - 1][2]):
            return k
    raise AssertionError("no mid-transaction cut found in fixture")


def test_rebalance_handoff_resumes_from_committed_watermark(
    spark, tmpdir_path
):
    stream, rec = _stream_and_recording(tmpdir_path)
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(),
        num_buckets=4,
    )

    # consumer A owns partition 0, processes one capped batch
    cut = _find_mid_txn_cut(stream)
    batch1 = recorded_kafka_frames(spark, rec, {0: 0}, max_records=cut)
    IngestPipeline(spark, store, CFG).apply_frames(batch1, batch_id=1)
    store.refresh()
    committed = {0: store.hwm()[1] + 1}
    # the committed offset must never exceed the delivered position,
    # and when the cut lands mid-transaction it is strictly below it
    assert committed[0] <= cut

    # rebalance: consumer B (fresh instance, fresh pipeline) takes
    # partition 0 and resumes from the COMMITTED offset
    store_b = SnapshotStore(spark, os.path.join(tmpdir_path, "t"))
    batch2 = recorded_kafka_frames(spark, rec, committed)
    IngestPipeline(spark, store_b, CFG).apply_frames(batch2, batch_id=2)

    assert _state(store_b) == _oracle_text(stream)


def test_rebalance_after_crash_without_offset_commit(spark, tmpdir_path):
    """Consumer A applied a batch but died BEFORE committing offsets:
    B resumes from A's starting offset, re-delivering everything A
    already applied — the watermark must dedup the replay exactly."""
    stream, rec = _stream_and_recording(tmpdir_path)
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(),
        num_buckets=4,
    )
    cut = _find_mid_txn_cut(stream)
    batch1 = recorded_kafka_frames(spark, rec, {0: 0}, max_records=cut)
    IngestPipeline(spark, store, CFG).apply_frames(batch1, batch_id=1)
    applied_first = store.read_table().count()
    assert applied_first > 0

    # B resumes from offset 0 (A never committed)
    store_b = SnapshotStore(spark, os.path.join(tmpdir_path, "t"))
    batch2 = recorded_kafka_frames(spark, rec, {0: 0})
    IngestPipeline(spark, store_b, CFG).apply_frames(batch2, batch_id=2)
    assert _state(store_b) == _oracle_text(stream)


def test_committing_delivered_position_would_lose_heldback_frames(
    spark, tmpdir_path
):
    """Negative control: pins WHY the contract is watermark-derived.
    If the cut held frames back (committed < cut), resuming from the
    DELIVERED position must yield a final state missing rows — i.e.
    the naive commit is provably lossy, the watermark commit is not."""
    stream, rec = _stream_and_recording(tmpdir_path)
    root = os.path.join(tmpdir_path, "t")
    store = SnapshotStore.create(
        spark, root, transcripts_schema(), num_buckets=4,
    )
    cut = _find_mid_txn_cut(stream)
    batch1 = recorded_kafka_frames(spark, rec, {0: 0}, max_records=cut)
    IngestPipeline(spark, store, CFG).apply_frames(batch1, batch_id=1)
    store.refresh()
    held_back = cut - (store.hwm()[1] + 1)
    assert held_back > 0, (
        "fixture must cut mid-transaction (tiny flush target)"
    )
    naive = recorded_kafka_frames(spark, rec, {0: cut})
    # the naive resume skips the held-back frames entirely; with
    # strict_frame_order the engine REFUSES the gapped stream rather
    # than silently losing the data
    import pytest

    store_b = SnapshotStore(spark, root)
    with pytest.raises(RuntimeError, match="out-of-order|frame"):
        IngestPipeline(spark, store_b, CFG).apply_frames(
            naive, batch_id=2
        )


def test_recording_matches_kafka_schema(spark, tmpdir_path):
    stream, rec = _stream_and_recording(tmpdir_path)
    from pg_pb3_ld_spark.sources.frames import KAFKA_RECORD_DDL

    df = spark.read.schema(KAFKA_RECORD_DDL).parquet(rec)
    row = df.orderBy("offset").first()
    assert row["topic"] == "pb3ld" and row["partition"] == 0
    assert row["timestampType"] == 0
    hdr = {h["key"]: bytes(h["value"]) for h in row["headers"]}
    assert int.from_bytes(hdr["lsn"], "big") == stream.frames[0][1]
    assert bytes(row["value"]) == stream.frames[0][2]
