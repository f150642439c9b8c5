"""Live-transport end-to-end (round 4, the r3 'What's missing #1'):
a REAL socket carries the wire frames — producer → TCP receiver →
landing zone → Structured Streaming → MERGE — and the applied-LSN
acks flowing back on the same socket (the standby-status-update
analog, fuzzer.go:439-529) must reflect the consumer's committed
high-watermark, including across a reconnect that resumes from the
acked LSN.
"""

from __future__ import annotations

import datetime
import os

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore
from pg_pb3_ld_spark.sources.live import LiveFrameReceiver, LiveFrameSender
from pg_pb3_ld_spark.streaming.runner import run_stream


def _cfg():
    return EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )


def _check_final(store, stream):
    got = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in store.read_table().collect()
    }
    assert set(got) == set(stream.oracle)
    for key, exp in stream.oracle.items():
        for col, v in exp.items():
            gv = got[key].get(col)
            if col == "ts" and gv is not None:
                gv = gv.replace(tzinfo=datetime.timezone.utc)
            assert gv == v, f"{key}.{col}: {gv!r} != {v!r}"


def test_socket_stream_acks_and_replay(spark, tmpdir_path):
    stream = generate_stream(seed=31, n_convs=12, max_turns=6,
                             n_extra_txns=30)
    landing = os.path.join(tmpdir_path, "landing")
    root = os.path.join(tmpdir_path, "table")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    store = SnapshotStore.create(
        spark, root, transcripts_schema(), num_buckets=4
    )
    rx = LiveFrameReceiver(
        landing, hwm_fn=lambda: store.hwm()[0], batch_max=16
    ).start()
    try:
        frames = stream.frames
        half = len(frames) // 2

        # ---- session 1: first half of the stream
        tx = LiveFrameSender(rx.address)
        for seq, lsn, frame in frames[:half]:
            ack = tx.send(seq, lsn, frame)
            assert ack == -1  # nothing applied yet
        assert tx.keepalive() == -1
        tx.close()

        run_stream(spark, landing, store, _cfg(), checkpoint_dir=ckpt)
        hwm1 = store.hwm()[0]
        assert hwm1 > 0

        # ---- session 2 (reconnect): resume from the acked LSN —
        # plus a deliberate overlap re-sending the tail of session 1,
        # which the watermark must absorb idempotently
        tx = LiveFrameSender(rx.address)
        first_ack = tx.keepalive()
        assert first_ack == hwm1  # the ack reports durable state
        overlap = max(half - 5, 0)
        for seq, lsn, frame in frames[overlap:]:
            tx.send(seq, lsn, frame)
        assert tx.keepalive() == hwm1  # not yet applied, ack unchanged
        tx.close()

        run_stream(spark, landing, store, _cfg(), checkpoint_dir=ckpt)
        hwm2 = store.hwm()[0]
        assert hwm2 > hwm1

        # ---- session 3: keepalive-only connection sees the final hwm
        tx = LiveFrameSender(rx.address)
        assert tx.keepalive() == hwm2
        tx.close()

        assert rx.frames_received == len(frames) + 5  # incl. overlap
        assert rx.errors == []
        _check_final(store, stream)

        # landing-zone ordering contract: mtimes strictly increase in
        # arrival order (the file source orders micro-batches by mtime)
        files = sorted(
            f for f in os.listdir(landing) if f.endswith(".parquet")
        )
        mtimes = [os.stat(os.path.join(landing, f)).st_mtime for f in files]
        assert mtimes == sorted(mtimes)
        assert len(set(mtimes)) == len(mtimes)
    finally:
        rx.stop()
