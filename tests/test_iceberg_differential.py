"""Differential test pinning the Iceberg MERGE semantics executably.

No Iceberg runtime jar ships in the sandbox, so ``merge_sql``'s
generated statement can't execute here — instead ``simulate_merge``
interprets its WHEN clauses clause-for-clause as a full-outer-join,
and this test replays the same folded change batches through

  (a) ``SnapshotStore.merge`` (the COW sandbox sink, written
      independently in sinks/store.py), and
  (b) chained ``simulate_merge`` applications,

asserting identical final tables.  Covers DELETE / REPLACE / PATCH
kinds, TOAST-omission partial updates, multi-batch application, and
the evolved-column case (the generator adds a ``model`` column
mid-stream).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
from pg_pb3_ld_spark.operators.decode import decode_typed_changes
from pg_pb3_ld_spark.operators.fold import fold_changes
from pg_pb3_ld_spark.operators.txn import (
    batch_summary_typed,
    gate_by_commit_watermark,
)
from pg_pb3_ld_spark.pipeline import PROBE_COLS, IngestPipeline
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.iceberg import simulate_merge
from pg_pb3_ld_spark.sinks.store import SnapshotStore


def _cfg():
    return EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )


def _rows(df, schema):
    cols = [c.name for c in schema.columns]
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("seed,n_batches", [(101, 1), (202, 3)])
def test_merge_sql_semantics_match_snapshot_store(
    spark, tmpdir_path, seed, n_batches
):
    stream = generate_stream(
        seed=seed, n_convs=10, max_turns=6, n_extra_txns=40
    )
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    frames = spark.read.parquet(fp)
    cfg = _cfg()
    final_schema = stream.schema  # includes the evolved 'model' column

    # (a) the COW snapshot store via the full pipeline
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"), transcripts_schema(),
        num_buckets=4,
    )
    pipe = IngestPipeline(spark, store, cfg)
    n = len(stream.frames)
    step = (n + n_batches - 1) // n_batches
    lo = -1
    for b in range(n_batches):
        hi = min((b + 1) * step, n)
        pipe.apply_frames(
            frames.where(
                (F.col("frame_seq") > lo) & (F.col("frame_seq") < hi)
            ),
            batch_id=b,
        )
        lo = hi - 1

    # (b) the MERGE-clause interpreter over the same folded batches,
    # decoded with the final schema from the start (Iceberg's ALTER
    # TABLE ADD COLUMN before the batch's MERGE)
    target = spark.createDataFrame([], final_schema.ddl())
    lo = -1
    for b in range(n_batches):
        hi = min((b + 1) * step, n)
        batch = frames.where(
            (F.col("frame_seq") > lo) & (F.col("frame_seq") < hi)
        )
        lo = hi - 1
        typed = decode_typed_changes(batch, final_schema, cfg)
        summary = batch_summary_typed(typed)
        data = typed.where(
            F.col("table_name") == final_schema.table
        ).drop(*PROBE_COLS)
        gated = gate_by_commit_watermark(
            data, summary["commit_ord"], has_commits=True
        )
        folded = fold_changes(gated, final_schema)
        target = simulate_merge(target, folded, final_schema)
        # materialize per batch (the chained plan otherwise grows)
        target = spark.createDataFrame(
            target.collect(), final_schema.ddl()
        )

    got_store = _rows(store.read_table(), final_schema)
    got_sql = _rows(target, final_schema)
    assert got_store == got_sql
    # and both equal the single-threaded Python oracle
    cols = [c.name for c in final_schema.columns]
    want = sorted(
        tuple(
            v.timestamp() if hasattr(v, "timestamp") and c == "ts" else v
            for c, v in ((c, row.get(c)) for c in cols)
        )
        for row in stream.oracle.values()
    )
    got_norm = sorted(
        tuple(
            v.timestamp() if hasattr(v, "timestamp") and c == "ts" else v
            for c, v in zip(cols, row)
        )
        for row in got_sql
    )
    assert got_norm == want


def test_merge_kinds_unit(spark):
    """Clause-level unit check: one batch exercising every WHEN arm
    against a hand-built target."""
    from pg_pb3_ld_spark.schema import TargetColumn, TargetSchema

    schema = TargetSchema(
        "t",
        [
            TargetColumn("k", 25, "string", is_key=True),
            TargetColumn("a", 25, "string"),
            TargetColumn("b", 25, "string"),
        ],
    )
    target = spark.createDataFrame(
        [("del", "x", "y"), ("rep", "x", "y"), ("pat", "x", "y"),
         ("untouched", "x", "y")],
        "k string, a string, b string",
    )
    folded = spark.createDataFrame(
        [
            ("del", "DELETE", None, False, None, False, 1, 1, 1),
            ("rep", "REPLACE", "A", True, None, False, 1, 1, 1),
            ("pat", "PATCH", "A", True, None, False, 1, 1, 1),
            ("new", "PATCH", None, False, "B", True, 1, 1, 1),
            ("newdel", "DELETE", None, False, None, False, 1, 1, 1),
        ],
        "k string, kind string, a string, a_set boolean, "
        "b string, b_set boolean, last_lsn long, last_frame_seq long, "
        "n_changes long",
    )
    got = {
        r["k"]: (r["a"], r["b"])
        for r in simulate_merge(target, folded, schema).collect()
    }
    assert got == {
        "rep": ("A", None),      # REPLACE rebuilds: absent b → NULL
        "pat": ("A", "y"),       # PATCH: only set columns overwrite
        "new": (None, "B"),      # NOT MATCHED insert, absent a → NULL
        "untouched": ("x", "y"),
        # "del" dropped; "newdel" never inserted
    }


# ------------------------------------------------------------------
# round-3 extensions (VERDICT #8): snapshot-property-hwm commit path
# and concurrent-writer conflict — both executable in the sandbox
# ------------------------------------------------------------------

_FOLD_DDL = (
    "conv_id string, turn_idx int, kind string, "
    "role string, role_set boolean, text string, text_set boolean, "
    "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
    "last_lsn long, last_frame_seq long, n_changes long"
)


def _folded(spark, rows):
    """Hand-built fold output rows: (conv, turn, kind, text, lsn)."""
    return spark.createDataFrame(
        [
            (c, t, k, None, False, txt, txt is not None, None, False,
             None, False, lsn, lsn, 1)
            for c, t, k, txt, lsn in rows
        ],
        _FOLD_DDL,
    )


def test_iceberg_merge_sets_snapshot_property_hwm(spark):
    """The IcebergSink commit protocol: the applied-LSN watermark MUST
    be staged as snapshot properties BEFORE the MERGE executes, so
    data + watermark land in ONE Iceberg snapshot (exactly-once).  No
    runtime jar ships here, so the sql call is captured via a session
    proxy and checked for ordering + statement text."""
    from pg_pb3_ld_spark.sinks.iceberg import IcebergSink, merge_sql

    calls = []

    class _Proxy:
        def __init__(self, real):
            self._real = real
            self.conf = real.conf

        def sql(self, q):
            calls.append(
                (q,
                 self.conf.get("spark.wap.snapshot-property.applied-lsn"),
                 self.conf.get("spark.wap.snapshot-property.applied-frame"))
            )

    schema = transcripts_schema()
    folded = _folded(spark, [("c0", 0, "PATCH", "hello", 42)])
    sink = IcebergSink(_Proxy(spark), "cat.db.transcripts")
    sink.merge(folded, schema, hwm=(4242, 17))
    assert len(calls) == 1
    stmt, lsn_prop, frame_prop = calls[0]
    assert stmt == merge_sql(schema, "cat.db.transcripts")
    # properties visible at MERGE time — the snapshot carries them
    assert (lsn_prop, frame_prop) == ("4242", "17")


def test_hwm_commits_atomically_with_data(spark, tmpdir_path):
    """Sandbox analog of the snapshot-property commit: a crash AFTER
    the snapshot meta is written but BEFORE the pointer swap must
    leave BOTH the table state and the watermark at the old snapshot
    (data+hwm travel together); the retry then applies cleanly."""
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(),
        num_buckets=2,
    )
    store.merge(_folded(spark, [("c0", 0, "PATCH", "v1", 100)]),
                batch_id=1, hwm_override=(100, 0))
    assert store.hwm() == (100, 0)

    # crash between meta write and pointer swap
    orig_swap = type(store)._swap_pointer
    try:
        def boom(root, sid):
            raise OSError("simulated crash before pointer swap")
        type(store)._swap_pointer = staticmethod(boom)
        with pytest.raises(OSError, match="simulated crash"):
            store.merge(
                _folded(spark, [("c0", 0, "PATCH", "v2", 200)]),
                batch_id=2, hwm_override=(200, 1),
            )
    finally:
        type(store)._swap_pointer = staticmethod(orig_swap)

    # a fresh reader sees the OLD snapshot: old data AND old watermark
    reopened = SnapshotStore(spark, store.root)
    assert reopened.hwm() == (100, 0)
    rows = {r["turn_idx"]: r["text"] for r in reopened.read_table().collect()}
    assert rows == {0: "v1"}

    # retry converges (orphan snapshot dir is reclaimed once it ages
    # past the commit lease — a fresh colliding dir could be a LIVE
    # writer mid-commit and must conflict instead; backdating stands
    # in for the post-crash elapsed time / retry backoff)
    orphan = os.path.join(store.root, "snapshots", "000002")
    old = os.stat(orphan).st_mtime - SnapshotStore.ORPHAN_LEASE_SEC - 5
    os.utime(orphan, (old, old))
    reopened.merge(_folded(spark, [("c0", 0, "PATCH", "v2", 200)]),
                   batch_id=2, hwm_override=(200, 1))
    assert reopened.hwm() == (200, 1)
    rows = {r["turn_idx"]: r["text"] for r in reopened.read_table().collect()}
    assert rows == {0: "v2"}


def test_concurrent_writer_conflict(spark, tmpdir_path):
    """Two interleaved merges from independent store handles: the
    stale writer's commit must FAIL (Iceberg CommitFailedException
    analog), and refresh()+retry must converge to the sequential
    result — silent last-writer-wins would lose committed data."""
    from pg_pb3_ld_spark.sinks.store import CommitConflictError

    root = os.path.join(tmpdir_path, "t")
    a = SnapshotStore.create(spark, root, transcripts_schema(), num_buckets=2)
    b = SnapshotStore(spark, root)  # second writer, same base snapshot

    a.merge(_folded(spark, [("c0", 0, "PATCH", "from-a", 100)]),
            batch_id=1, hwm_override=(100, 0))

    with pytest.raises(CommitConflictError, match="refresh"):
        b.merge(_folded(spark, [("c1", 0, "PATCH", "from-b", 200)]),
                batch_id=2, hwm_override=(200, 1))

    # Iceberg retry protocol: refresh to the new base, re-merge
    b.refresh()
    b.merge(_folded(spark, [("c1", 0, "PATCH", "from-b", 200)]),
            batch_id=2, hwm_override=(200, 1))

    final = SnapshotStore(spark, root)
    rows = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in final.read_table().collect()
    }
    assert rows == {("c0", 0): "from-a", ("c1", 0): "from-b"}
    assert final.hwm() == (200, 1)
