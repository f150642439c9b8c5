"""Crash-consistency tests for the snapshot store (D6).

The commit protocol is: write data files → write meta.json → atomic
pointer swap (os.replace).  A crash at any earlier point leaves the
pointer on the previous snapshot; replaying the batch must converge
to the same state (the orphaned snapshot dir gets overwritten).
"""

from __future__ import annotations

import json
import os

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
from pg_pb3_ld_spark.pipeline import IngestPipeline
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore


def _cfg():
    return EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )


def _final(store):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in store.read_table().collect()
    }


def test_crash_before_pointer_swap_replays_cleanly(spark, tmpdir_path):
    stream = generate_stream(seed=21, n_convs=8, max_turns=5, n_extra_txns=15)
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    frames = spark.read.parquet(fp)

    root = os.path.join(tmpdir_path, "table")
    store = SnapshotStore.create(spark, root, transcripts_schema(), num_buckets=4)
    pipe = IngestPipeline(spark, store, _cfg())
    n = len(stream.frames)
    pipe.apply_frames(frames.where(f"frame_seq < {n // 2}"), batch_id=1)
    good = store.snapshot_id

    # simulate a crash mid-commit of batch 2: snapshot dir + meta were
    # written but the pointer swap never happened
    pipe.apply_frames(frames, batch_id=2)
    crashed = store.snapshot_id
    SnapshotStore._swap_pointer(root, good)  # roll the pointer back
    # crash recovery happens minutes later in practice — backdate the
    # orphan past the commit lease so the replay may reclaim it (a
    # FRESH colliding dir must instead raise CommitConflictError: it
    # could be a live writer mid-commit; see test_iceberg_differential)
    orphan = os.path.join(root, "snapshots", f"{crashed:06d}")
    old = os.stat(orphan).st_mtime - SnapshotStore.ORPHAN_LEASE_SEC - 5
    os.utime(orphan, (old, old))

    # recovery: a fresh consumer opens the store at the old snapshot
    # and replays everything from the checkpointed source
    store2 = SnapshotStore(spark, root)
    assert store2.snapshot_id == good
    pipe2 = IngestPipeline(spark, store2, _cfg())
    pipe2.apply_frames(frames, batch_id=2)
    assert store2.snapshot_id == crashed  # orphan dir overwritten
    got = _final(store2)
    want = {k: v["text"] for k, v in stream.oracle.items()}
    assert got == want


def test_lineage_and_manifest_consistency(spark, tmpdir_path):
    stream = generate_stream(seed=22, n_convs=6, max_turns=4, n_extra_txns=10)
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    root = os.path.join(tmpdir_path, "table")
    store = SnapshotStore.create(spark, root, transcripts_schema(), num_buckets=4)
    IngestPipeline(spark, store, _cfg()).apply_frames(
        spark.read.parquet(fp), batch_id=7
    )
    # manifest invariants: every referenced file dir exists; hwm set;
    # lineage covers every bucket holding data
    meta = json.load(
        open(os.path.join(root, "snapshots",
                          f"{store.snapshot_id:06d}", "meta.json"))
    )
    assert meta["hwm"]["lsn"] > 0
    for b, rel in meta["files"].items():
        assert os.path.isdir(os.path.join(root, rel)), rel
        assert b in meta["lineage"]
        assert meta["lineage"][b]["last_batch"] == 7
    # rows in files match the lineage's applied-key accounting at the
    # whole-table level (upserts - deletes bounded by total rows)
    total = store.read_table().count()
    assert total == len(stream.oracle)
