"""Merge-on-read (MoR) delta-log apply mode.

``SnapshotStore.merge_mor`` appends the folded batch as bucket-
partitioned delta files (no target read, no join, no base rewrite);
``read()`` resolves base+deltas under the same last-write-wins-per-
column algebra the COW merge materializes; ``compact()`` folds the
delta log back into base files.  The scale contract: a MoR commit's
write cost is proportional to the BATCH, a COW merge's to the touched
buckets' total rows — at 10^10 events the hot path ingests via MoR
and a background compactor bounds read amplification (Iceberg v2 /
Hudi MOR semantics).

These tests pin the equivalence that makes the mode safe to use:
**replaying the same folded batches through merge_mor (with or
without interleaved compactions) yields a table byte-identical to
replaying them through the COW merge** — including TOAST-omission
PATCH column semantics, DELETE-then-PATCH revival, REPLACE rebuilds,
additive schema evolution mid-stream, and COW merges absorbing
outstanding deltas.
"""

from __future__ import annotations

import os
import random

import pytest

from pg_pb3_ld_spark.schema import (
    TargetColumn,
    transcripts_schema,
)
from pg_pb3_ld_spark.sinks.store import CommitConflictError, SnapshotStore

_FOLD_DDL = (
    "conv_id string, turn_idx int, kind string, "
    "role string, role_set boolean, text string, text_set boolean, "
    "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
    "last_lsn long, last_frame_seq long, n_changes long"
)


def _folded(spark, rows):
    """rows: (conv_id, turn_idx, kind, role|None, text|None, tool|None,
    lsn) — a column participates (set) iff its value is not None,
    EXCEPT for REPLACE/DELETE rows where the fold marks every column
    set (operators/fold.py:119-121)."""
    out = []
    for c, t, k, role, txt, tool, lsn in rows:
        barrier = k in ("REPLACE", "DELETE")
        out.append(
            (
                c, t, k,
                role, barrier or role is not None,
                txt, barrier or txt is not None,
                tool, barrier or tool is not None,
                None, barrier,
                lsn, lsn, 1,
            )
        )
    return spark.createDataFrame(out, _FOLD_DDL)


def _table(store):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in store.read_table().collect()
    }


def _pair(spark, tmpdir_path, num_buckets=4):
    cow = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "cow"), transcripts_schema(),
        num_buckets=num_buckets,
    )
    mor = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "mor"), transcripts_schema(),
        num_buckets=num_buckets,
    )
    return cow, mor


def _random_batches(seed, n_batches=4, n_keys=40):
    """Deterministic stream of folded batches exercising every kind
    and every per-column set/unset combination."""
    rng = random.Random(seed)
    lsn = 0
    batches = []
    for _ in range(n_batches):
        rows = []
        for key in rng.sample(range(n_keys), rng.randint(8, n_keys)):
            conv, turn = f"c{key % 12}", key // 12
            kind = rng.choice(["PATCH", "PATCH", "REPLACE", "DELETE"])
            lsn += 1
            if kind == "DELETE":
                rows.append((conv, turn, kind, None, None, None, lsn))
                continue
            role = f"r{lsn}" if rng.random() < 0.5 else None
            txt = f"t{lsn}" if rng.random() < 0.7 else None
            tool = f"x{lsn}" if rng.random() < 0.3 else None
            rows.append((conv, turn, kind, role, txt, tool, lsn))
        batches.append(rows)
    return batches


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_mor_equals_cow_differential(spark, tmpdir_path, seed):
    cow, mor = _pair(spark, tmpdir_path)
    for i, rows in enumerate(_random_batches(seed)):
        df = _folded(spark, rows)
        cow.merge(df, batch_id=i)
        mor.merge_mor(df, batch_id=i)
        assert _table(cow) == _table(mor)
    assert mor.delta_state()  # deltas actually accumulated
    assert mor.hwm() == cow.hwm()


@pytest.mark.parametrize("compact_after", [1, 2])
def test_mor_with_interleaved_compaction(spark, tmpdir_path, compact_after):
    cow, mor = _pair(spark, tmpdir_path)
    for i, rows in enumerate(_random_batches(seed=5, n_batches=4)):
        df = _folded(spark, rows)
        cow.merge(df, batch_id=i)
        mor.merge_mor(df, batch_id=i)
        if i == compact_after:
            res = mor.compact()
            assert res["compacted_buckets"] > 0
            assert mor.delta_state() == {}
        assert _table(cow) == _table(mor)
    # final compaction converges to a pure-base table, still identical
    mor.compact()
    assert mor.delta_state() == {}
    assert _table(cow) == _table(mor)
    # idempotence: nothing left to compact
    assert mor.compact() == {"compacted_buckets": 0, "skipped": True}


def test_mor_delete_then_patch_revival(spark, tmpdir_path):
    """DELETE in one delta, PATCH in a later one: the row re-inserts
    with only the patched columns set — columns from before the
    DELETE must NOT leak through the delta log."""
    cow, mor = _pair(spark, tmpdir_path)
    steps = [
        [("a", 1, "REPLACE", "user", "hello", "grep", 1)],
        [("a", 1, "DELETE", None, None, None, 2)],
        [("a", 1, "PATCH", None, "revived", None, 3)],
    ]
    for i, rows in enumerate(steps):
        df = _folded(spark, rows)
        cow.merge(df, batch_id=i)
        mor.merge_mor(df, batch_id=i)
    expect = {("a", 1): (None, "revived", None)}
    assert _table(cow) == expect
    assert _table(mor) == expect


def test_mor_replace_rebuilds_row(spark, tmpdir_path):
    """REPLACE in a later delta kills earlier column values (the
    INSERT barrier), even ones the REPLACE itself leaves NULL."""
    cow, mor = _pair(spark, tmpdir_path)
    steps = [
        [("a", 1, "PATCH", "user", "old-text", "old-tool", 1)],
        [("a", 1, "REPLACE", None, "rebuilt", None, 2)],
        [("a", 1, "PATCH", "asst", None, None, 3)],
    ]
    for i, rows in enumerate(steps):
        df = _folded(spark, rows)
        cow.merge(df, batch_id=i)
        mor.merge_mor(df, batch_id=i)
    expect = {("a", 1): ("asst", "rebuilt", None)}
    assert _table(cow) == expect
    assert _table(mor) == expect


def test_cow_merge_absorbs_outstanding_deltas(spark, tmpdir_path):
    """A COW merge folds any MoR deltas for its buckets into the new
    base files and clears their delta log; untouched buckets keep
    their deltas."""
    mor = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "m"), transcripts_schema(),
        num_buckets=4,
    )
    wide = [(f"c{i}", 0, "PATCH", None, f"v{i}", None, i + 1)
            for i in range(16)]
    mor.merge_mor(_folded(spark, wide), batch_id=0)
    before = mor.delta_state()
    assert sum(before.values()) > 0
    # COW-merge a single key: only its bucket's deltas are absorbed
    one = [("c3", 0, "PATCH", "user", None, None, 100)]
    mor.merge(_folded(spark, one), batch_id=1)
    b3 = {
        int(r["_bucket"])
        for r in mor.read().where("conv_id = 'c3'").collect()
    }.pop()
    after = mor.delta_state()
    assert after.get(b3, 0) == 0
    assert sum(after.values()) == sum(before.values()) - before.get(b3, 0)
    t = _table(mor)
    assert t[("c3", 0)] == ("user", "v3", None)
    assert t[("c5", 0)] == (None, "v5", None)


def test_mor_schema_evolution_mid_stream(spark, tmpdir_path):
    """Delta files written before an additive evolution lack the new
    column; the explicit read schema fills NULL and the resolution
    treats the NULL set-flag as not-present."""
    mor = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "m"), transcripts_schema(),
        num_buckets=2,
    )
    mor.merge_mor(
        _folded(spark, [("a", 1, "PATCH", "user", "pre", None, 1)]),
        batch_id=0,
    )
    evolved = mor.schema.with_column(
        TargetColumn("model", 25, "string")
    )
    post = spark.createDataFrame(
        [("a", 1, "PATCH", None, False, None, False, None, False,
          None, False, "m-9", True, 2, 2, 1),
         ("b", 2, "PATCH", None, False, "btxt", True, None, False,
          None, False, None, False, 3, 3, 1)],
        "conv_id string, turn_idx int, kind string, "
        "role string, role_set boolean, text string, text_set boolean, "
        "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
        "model string, model_set boolean, "
        "last_lsn long, last_frame_seq long, n_changes long",
    )
    mor.merge_mor(post, schema=evolved, batch_id=1)
    rows = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["model"])
        for r in mor.read_table().collect()
    }
    assert rows == {
        ("a", 1): ("user", "pre", "m-9"),
        ("b", 2): (None, "btxt", None),
    }
    # compaction carries the evolved column into the base files
    mor.compact()
    rows2 = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["model"])
        for r in mor.read_table().collect()
    }
    assert rows2 == rows


def test_mor_bucket_pruned_read(spark, tmpdir_path):
    mor = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "m"), transcripts_schema(),
        num_buckets=4,
    )
    wide = [(f"c{i}", 0, "PATCH", None, f"v{i}", None, i + 1)
            for i in range(16)]
    mor.merge_mor(_folded(spark, wide), batch_id=0)
    all_rows = mor.read().collect()
    by_bucket: dict[int, set] = {}
    for r in all_rows:
        by_bucket.setdefault(int(r["_bucket"]), set()).add(r["conv_id"])
    for b, convs in by_bucket.items():
        got = {r["conv_id"] for r in mor.read(buckets=[b]).collect()}
        assert got == convs


def test_mor_lineage_and_watermark(spark, tmpdir_path):
    mor = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "m"), transcripts_schema(),
        num_buckets=2,
    )
    mor.merge_mor(
        _folded(spark, [("a", 1, "PATCH", None, "x", None, 10)]),
        batch_id=7,
    )
    assert mor.hwm() == (10, 10)
    ds = mor.delta_state()
    assert sum(ds.values()) == 1
    (b,) = ds
    ent = mor.lineage()[str(b)]
    assert ent["last_batch"] == 7
    assert ent["delta_files"] == 1
    assert ent["lsn_range"] == [10, 10]
    mor.compact()
    ent2 = mor.lineage()[str(b)]
    assert ent2["delta_files"] == 0
    assert ent2["rows"] == 1
    assert ent2["compacted_at_snapshot"] == mor.snapshot_id
    # watermark untouched by compaction
    assert mor.hwm() == (10, 10)


def test_mor_pipeline_end_to_end_matches_oracle(spark, tmpdir_path):
    """Full wire-frames→decode→gate→fold→merge_mor pipeline replay,
    split into batches with auto-compaction, equals the single-
    threaded Python oracle — AND a second full replay is a no-op
    (exactly-once under MoR: the watermark semantics are shared)."""
    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.generator import (
        generate_stream,
        write_frames_parquet,
    )
    from pg_pb3_ld_spark.pipeline import IngestPipeline

    stream = generate_stream(
        seed=11, n_convs=15, max_turns=8, n_extra_txns=40
    )
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    frames = spark.read.parquet(fp)
    cfg = EngineConfig(
        type_oids_mode="omit_nulls",
        formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )

    def build(name, **kw):
        store = SnapshotStore.create(
            spark, os.path.join(tmpdir_path, name),
            transcripts_schema(), num_buckets=4,
        )
        return store, IngestPipeline(spark, store, cfg, **kw)

    cow_store, cow_pipe = build("cow")
    mor_store, mor_pipe = build(
        "mor", apply_mode="mor", compact_min_deltas=2
    )

    mid = frames.agg(
        {"frame_seq": "max"}
    ).collect()[0][0] // 2
    for pipe in (cow_pipe, mor_pipe):
        pipe.apply_frames(frames.where(f"frame_seq <= {mid}"), batch_id=1)
        pipe.apply_frames(frames.where(f"frame_seq > {mid}"), batch_id=2)

    def state(store):
        return {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
            for r in store.read_table().collect()
        }

    s_cow, s_mor = state(cow_store), state(mor_store)
    assert s_cow == s_mor
    assert set(s_mor) == set(stream.oracle)
    for key, exp in stream.oracle.items():
        assert s_mor[key] == (exp["role"], exp["text"])
    assert mor_store.hwm() == cow_store.hwm()

    # exactly-once: full replay applies nothing new
    snap_before = mor_store.snapshot_id
    m = mor_pipe.apply_frames(frames, batch_id=3)
    assert m["applied_keys"] == 0
    assert state(mor_store) == s_mor
    assert mor_store.snapshot_id <= snap_before + 1

    # trailing manual compaction converges to pure-base, state intact
    mor_store.compact()
    assert mor_store.delta_state() == {}
    assert state(mor_store) == s_mor


def test_mor_concurrent_commit_conflict_and_retry(spark, tmpdir_path):
    """Two writers on the same table: the loser's merge_mor raises
    CommitConflictError (shared optimistic commit protocol), and
    refresh()+retry lands its delta on the new base snapshot."""
    root = os.path.join(tmpdir_path, "m")
    SnapshotStore.create(spark, root, transcripts_schema(), num_buckets=2)
    w1 = SnapshotStore(spark, root)
    w2 = SnapshotStore(spark, root)
    w1.merge_mor(
        _folded(spark, [("a", 1, "PATCH", None, "w1", None, 1)]),
        batch_id=0,
    )
    df2 = _folded(spark, [("b", 2, "PATCH", None, "w2", None, 2)])
    with pytest.raises(CommitConflictError):
        w2.merge_mor(df2, batch_id=1)
    w2.refresh()
    w2.merge_mor(df2, batch_id=1)
    w1.refresh()
    assert _table(w1) == {
        ("a", 1): (None, "w1", None),
        ("b", 2): (None, "w2", None),
    }
