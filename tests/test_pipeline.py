"""End-to-end apply-semantics tests vs the Python oracle.

The analog of the reference fuzzer's oracle loop
(``tests/fuzzer/fuzzer.go:369-405``): generate a deterministic change
stream, run the full Spark pipeline, and require the final table
state to equal the single-threaded oracle **per-turn text equality
with stable turn ordering** (BASELINE.json invariant).
"""

from __future__ import annotations

import os

import pytest

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import GeneratedStream, generate_stream, write_frames_parquet
from pg_pb3_ld_spark.pipeline import IngestPipeline
from pg_pb3_ld_spark.sinks.store import SnapshotStore


def _stream_cfg():
    return EngineConfig(
        type_oids_mode="omit_nulls",
        formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )


@pytest.fixture(scope="module")
def stream() -> GeneratedStream:
    return generate_stream(seed=7, n_convs=25, max_turns=10, n_extra_txns=80)


def _frames_df(spark, stream, path):
    write_frames_parquet(stream, path)
    return spark.read.parquet(path)


def _final_state(store: SnapshotStore):
    rows = store.read_table().collect()
    return {
        (r["conv_id"], r["turn_idx"]): r.asDict() for r in rows
    }


def _assert_matches_oracle(store: SnapshotStore, stream: GeneratedStream):
    got = _final_state(store)
    assert set(got.keys()) == set(stream.oracle.keys())
    for key, exp in stream.oracle.items():
        g = got[key]
        for col, v in exp.items():
            gv = g.get(col)
            if col == "ts" and gv is not None:
                import datetime

                gv = gv.replace(tzinfo=datetime.timezone.utc)
            assert gv == v, f"{key} col {col}: got {gv!r} want {v!r}"
    # stable turn ordering: reading one conversation ordered by
    # turn_idx must produce exactly the oracle's turn sequence
    conv = sorted({k[0] for k in stream.oracle})[0]
    turns = [
        r["turn_idx"]
        for r in store.read_table()
        .where(f"conv_id = '{conv}'")
        .orderBy("turn_idx")
        .collect()
    ]
    assert turns == sorted(k[1] for k in stream.oracle if k[0] == conv)


def test_full_apply_matches_oracle(spark, stream, tmpdir_path):
    frames = _frames_df(spark, stream, os.path.join(tmpdir_path, "frames.parquet"))
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"),
        __import__("pg_pb3_ld_spark.schema", fromlist=["transcripts_schema"]).transcripts_schema(),
        num_buckets=8,
    )
    pipe = IngestPipeline(spark, store, _stream_cfg())
    metrics = pipe.apply_frames(frames, batch_id=1)
    assert metrics["applied_changes"] == stream.n_changes
    assert metrics["rows_written"] > 0
    # schema evolution (D7): 'model' column appeared mid-stream
    assert any(c.name == "model" for c in store.schema.columns)
    _assert_matches_oracle(store, stream)


def test_replay_is_idempotent(spark, stream, tmpdir_path):
    """Exactly-once (D6): applying the same frames again is a no-op,
    and a partial replay from mid-stream converges too."""
    from pg_pb3_ld_spark.schema import transcripts_schema

    frames = _frames_df(spark, stream, os.path.join(tmpdir_path, "frames.parquet"))
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"), transcripts_schema(), num_buckets=8
    )
    pipe = IngestPipeline(spark, store, _stream_cfg())
    m1 = pipe.apply_frames(frames, batch_id=1)
    snap1 = store.snapshot_id
    # full replay: watermark drops every frame
    m2 = pipe.apply_frames(frames, batch_id=2)
    assert m2.get("skipped") or m2["applied_keys"] == 0
    assert store.snapshot_id == snap1
    _assert_matches_oracle(store, stream)


def test_split_batches_equal_single_batch(spark, stream, tmpdir_path):
    """Applying the stream in 3 chronological batches produces the
    same final state as one batch (checkpoint-resume semantics)."""
    from pg_pb3_ld_spark.schema import transcripts_schema

    frames = _frames_df(spark, stream, os.path.join(tmpdir_path, "frames.parquet"))
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"), transcripts_schema(), num_buckets=8
    )
    pipe = IngestPipeline(spark, store, _stream_cfg())
    n = len(stream.frames)
    cut1, cut2 = stream.frames[n // 3][0], stream.frames[2 * n // 3][0]
    pipe.apply_frames(frames.where(f"frame_seq < {cut1}"), batch_id=1)
    pipe.apply_frames(frames.where(f"frame_seq < {cut2}"), batch_id=2)
    pipe.apply_frames(frames, batch_id=3)
    _assert_matches_oracle(store, stream)
    # lineage recorded per bucket with LSN ranges
    lineage = store.lineage()
    assert lineage
    for b, info in lineage.items():
        assert info["lsn_range"][0] <= info["lsn_range"][1]


def test_overlapping_replay_mid_stream(spark, stream, tmpdir_path):
    """Re-sending an already-applied frame range mid-stream (the
    reference's reconnect idiom, fuzzer.go:389-391) must not
    double-apply."""
    from pg_pb3_ld_spark.schema import transcripts_schema

    frames = _frames_df(spark, stream, os.path.join(tmpdir_path, "frames.parquet"))
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"), transcripts_schema(), num_buckets=8
    )
    pipe = IngestPipeline(spark, store, _stream_cfg())
    n = len(stream.frames)
    cut = stream.frames[n // 2][0]
    pipe.apply_frames(frames.where(f"frame_seq < {cut}"), batch_id=1)
    # replay overlaps: second batch re-sends everything from zero
    pipe.apply_frames(frames, batch_id=2)
    _assert_matches_oracle(store, stream)
