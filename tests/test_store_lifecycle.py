"""Store lifecycle: snapshot bootstrap → incremental switchover,
time-travel reads, and snapshot expiry (GC).

* ``bootstrap`` is the Debezium/DMS "initial snapshot then stream"
  pattern: bulk-load a consistent state, pin the watermark to its
  LSN, and let the standard replay filter make the WAL-tail overlap
  idempotent.  The differential: bootstrap(prefix state) + full
  replay ≡ replaying everything from empty.
* ``read(as_of=)`` reads any un-expired snapshot exactly as committed
  (files, deltas, schema version) — Iceberg ``VERSION AS OF``.
* ``expire_snapshots`` deletes snapshot dirs not referenced by the
  retained manifests; COW carries untouched buckets by reference to
  parent snapshots, so the reference walk — not age alone — decides
  what survives.
"""

from __future__ import annotations

import os

import pytest

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
from pg_pb3_ld_spark.pipeline import IngestPipeline
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

from tests.test_mor import _folded


def _cfg():
    return EngineConfig(
        type_oids_mode="omit_nulls",
        formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )


def _state(store, as_of=None):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in store.read_table(as_of=as_of).collect()
    }


def test_bootstrap_then_incremental_equals_full_replay(spark, tmpdir_path):
    stream = generate_stream(seed=3, n_convs=12, max_turns=8,
                             n_extra_txns=40)
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    frames = spark.read.parquet(fp)
    mid = frames.agg({"frame_seq": "max"}).collect()[0][0] // 2

    # reference: full replay from empty
    full = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "full"), transcripts_schema(),
        num_buckets=4,
    )
    IngestPipeline(spark, full, _cfg()).apply_frames(frames, batch_id=1)

    # source-snapshot provider: prefix replay (stands in for the
    # "SELECT * FROM t" initial snapshot a real connector takes)
    helper = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "helper"), transcripts_schema(),
        num_buckets=4,
    )
    IngestPipeline(spark, helper, _cfg()).apply_frames(
        frames.where(f"frame_seq <= {mid}"), batch_id=1
    )

    boot = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "boot"), helper.schema,
        num_buckets=4,
    )
    res = boot.bootstrap(helper.read_table(), as_of=helper.hwm())
    assert res["bootstrap_rows"] > 0
    assert boot.hwm() == helper.hwm()

    # incremental tail with FULL overlap: frames at-or-below the
    # bootstrap point must be dropped by the replay filter
    IngestPipeline(spark, boot, _cfg()).apply_frames(frames, batch_id=2)
    assert _state(boot) == _state(full)
    assert boot.hwm() == full.hwm()


def test_bootstrap_requires_empty_store(spark, tmpdir_path):
    s = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "s"), transcripts_schema(),
        num_buckets=2,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", None, "x", None, 1)]),
        batch_id=0,
    )
    with pytest.raises(RuntimeError, match="empty store"):
        s.bootstrap(s.read_table(), as_of=(99, 99))


def test_time_travel_reads_past_snapshots(spark, tmpdir_path):
    s = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "s"), transcripts_schema(),
        num_buckets=2,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", "user", "v1", None, 1)]),
        batch_id=1,
    )
    st1 = _state(s)
    s.merge_mor(
        _folded(spark, [("a", 1, "PATCH", None, "v2", None, 2),
                        ("b", 2, "PATCH", None, "new", None, 3)]),
        batch_id=2,
    )
    st2 = _state(s)
    s.merge(
        _folded(spark, [("a", 1, "DELETE", None, None, None, 4)]),
        batch_id=3,
    )
    st3 = _state(s)

    assert _state(s, as_of=1) == st1
    # snapshot 2 had outstanding deltas — time travel resolves them
    assert _state(s, as_of=2) == st2
    assert st2 == {("a", 1): ("user", "v2"), ("b", 2): (None, "new")}
    assert _state(s, as_of=3) == st3
    assert ("a", 1) not in st3
    with pytest.raises(ValueError, match="does not exist"):
        s.read_table(as_of=42).collect()


def test_time_travel_pins_schema_version(spark, tmpdir_path):
    from pg_pb3_ld_spark.schema import TargetColumn

    s = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "s"), transcripts_schema(),
        num_buckets=2,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", None, "x", None, 1)]),
        batch_id=1,
    )
    evolved = s.schema.with_column(TargetColumn("model", 25, "string"))
    df2 = spark.createDataFrame(
        [("a", 1, "PATCH", None, False, None, False, None, False,
          None, False, "m-1", True, 2, 2, 1)],
        "conv_id string, turn_idx int, kind string, "
        "role string, role_set boolean, text string, text_set boolean, "
        "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
        "model string, model_set boolean, "
        "last_lsn long, last_frame_seq long, n_changes long",
    )
    s.merge(df2, schema=evolved, batch_id=2)
    assert "model" in s.read_table().columns
    assert "model" not in s.read_table(as_of=1).columns


def test_expire_snapshots_respects_references(spark, tmpdir_path):
    s = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "s"), transcripts_schema(),
        num_buckets=4,
    )
    # batch 1 populates several buckets
    wide = [(f"c{i}", 0, "PATCH", None, f"v{i}", None, i + 1)
            for i in range(12)]
    s.merge(_folded(spark, wide), batch_id=1)
    # batches 2-3 each touch ONE key — other buckets stay carried by
    # reference to snapshot 1's files
    s.merge(_folded(spark, [("c0", 0, "PATCH", None, "u0", None, 50)]),
            batch_id=2)
    s.merge(_folded(spark, [("c1", 0, "PATCH", None, "u1", None, 51)]),
            batch_id=3)
    before = _state(s)

    res = s.expire_snapshots(keep_last=1)
    # snapshot 1 is still REFERENCED (untouched buckets) → retained;
    # snapshots 0 and 2 may expire (2 only if unreferenced)
    assert 1 in res["retained"]
    assert 0 in res["expired"]
    assert _state(s) == before
    # time travel to an expired snapshot raises; the current + any
    # retained snapshot still read
    for sid in res["expired"]:
        with pytest.raises(ValueError, match="does not exist"):
            s.read_table(as_of=sid).collect()
    assert _state(s, as_of=s.snapshot_id) == before

    hist = s.history()
    ids = [h["snapshot_id"] for h in hist]
    assert s.snapshot_id in ids and 0 not in ids
    assert [h for h in hist if h["is_current"]][0][
        "snapshot_id"
    ] == s.snapshot_id


def test_expire_keep_last_window(spark, tmpdir_path):
    s = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "s"), transcripts_schema(),
        num_buckets=2,
    )
    # every batch rewrites the SAME single key/bucket → no carried
    # references, so only the keep_last window survives
    for i in range(4):
        s.merge(
            _folded(spark, [("a", 1, "PATCH", None, f"v{i}", None, i + 1)]),
            batch_id=i,
        )
    res = s.expire_snapshots(keep_last=2)
    ids = {h["snapshot_id"] for h in s.history()}
    assert s.snapshot_id in ids and (s.snapshot_id - 1) in ids
    assert ids.isdisjoint(set(res["expired"]))
    assert _state(s) == {("a", 1): (None, "v3")}
    assert _state(s, as_of=s.snapshot_id - 1) == {("a", 1): (None, "v2")}
