"""Type-widening schema evolution (int4→int8 etc. on a live stream).

The reference stream carries a per-column type oid
(``decoder/fsd.c:253-294``); an upstream ``ALTER COLUMN TYPE`` changes
it mid-stream.  Pinned here:

1. the decoder NEVER parses a value with a stale width: known-name
   entries with a mismatched oid divert to the evolution probe (raw
   bytes preserved), typed columns read absent for those rows;
2. ``evolved_schema`` widens losslessly (Iceberg updateColumn rules),
   keeps the store type for narrower stragglers, and raises on key
   columns and lossy changes;
3. end-to-end: a stream that widens mid-batch — including a straggler
   old-oid row AFTER the first new-oid row — replays to the exact
   final state, with values beyond int4 range intact, old snapshots
   (narrow parquet) readable under the widened schema, and the
   widened type persisted across a store reopen;
4. absent ≠ NULL survives widening: a PATCH that omits the column
   keeps the target value, an explicit NULL sets NULL.
"""

from __future__ import annotations

import os

import pytest

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import _frames_table, encode_routed_changes
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.pipeline import IngestPipeline
from pg_pb3_ld_spark.schema import TargetColumn, TargetSchema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

BIG = 7_000_000_123  # beyond int4 range
NEG_BIG = -6_000_000_456

# text-format ints: oids outside every binary range
CFG_TEXT = EngineConfig(
    type_oids_mode="omit_nulls", formats_mode="disabled",
    binary_oid_ranges="1184",
)
# binary-format ints: int2/4/8 send forms (2/4/8 bytes) on the wire
CFG_BIN = EngineConfig(
    type_oids_mode="omit_nulls", formats_mode="disabled",
    binary_oid_ranges="20-23,1184",
)


def metrics_schema() -> TargetSchema:
    return TargetSchema(
        "metrics",
        [
            TargetColumn("metric_id", wire.OID_TEXT, "string", is_key=True),
            TargetColumn("label", wire.OID_TEXT, "string"),
            TargetColumn("n_tokens", wire.OID_INT4, "int"),
        ],
    )


def mrow(op, mid, label=None, tokens=None, tok_oid=wire.OID_INT4):
    key = [("metric_id", mid, wire.OID_TEXT)]
    vals = []
    if label is not None:
        vals.append(("label", label, wire.OID_TEXT))
    if tokens is not None:
        vals.append(("n_tokens", tokens, tok_oid))
    return ("public", "metrics", op, key, vals)


def _apply(spark, tmpdir_path, changes, cfg, batches=1):
    frames = encode_routed_changes(changes, cfg, txn_every=2)
    import pyarrow.parquet as pq

    path = os.path.join(tmpdir_path, "frames.parquet")
    pq.write_table(_frames_table(frames), path)
    fdf = spark.read.parquet(path)
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"), metrics_schema(),
        num_buckets=4,
    )
    pipe = IngestPipeline(spark, store, cfg)
    if batches == 1:
        pipe.apply_frames(fdf, batch_id=1)
    else:
        mid = frames[len(frames) // 2][0]
        pipe.apply_frames(fdf.where(f"frame_seq <= {mid}"), batch_id=1)
        pipe.apply_frames(fdf, batch_id=2)
    return store


def _state(store):
    return {
        r["metric_id"]: (r["label"], r["n_tokens"])
        for r in store.read_table().collect()
    }


WIDEN_CHANGES = [
    mrow("INSERT", "m1", "a", 100),
    mrow("INSERT", "m2", "b", 200),
    # upstream ALTER COLUMN n_tokens TYPE bigint happens here
    mrow("INSERT", "m3", "c", BIG, tok_oid=wire.OID_INT8),
    mrow("UPDATE", "m1", None, NEG_BIG, tok_oid=wire.OID_INT8),
    # straggler encoded before the ALTER committed (old oid, fits int4)
    mrow("UPDATE", "m2", None, 250, tok_oid=wire.OID_INT4),
    # PATCH omitting the column: keeps the (widened) target value
    mrow("UPDATE", "m3", "c2", None),
    mrow("INSERT", "m4", "d", 17, tok_oid=wire.OID_INT8),
]

EXPECTED = {
    "m1": ("a", NEG_BIG),
    "m2": ("b", 250),
    "m3": ("c2", BIG),
    "m4": ("d", 17),
}


@pytest.mark.parametrize("cfg", [CFG_TEXT, CFG_BIN], ids=["text", "bin"])
@pytest.mark.parametrize("batches", [1, 2], ids=["one-batch", "split"])
def test_widening_end_to_end(spark, tmpdir_path, cfg, batches):
    store = _apply(spark, tmpdir_path, WIDEN_CHANGES, cfg, batches=batches)
    col = store.schema.column("n_tokens")
    assert col.spark_type == "bigint"
    assert col.type_oid == wire.OID_INT8
    assert _state(store) == EXPECTED
    # widened type persisted: reopen from disk
    reopened = SnapshotStore(spark, store.root)
    assert reopened.schema.column("n_tokens").spark_type == "bigint"
    assert _state(reopened) == EXPECTED


def test_widening_then_explicit_null(spark, tmpdir_path):
    changes = WIDEN_CHANGES + [
        mrow("UPDATE", "m4", None, None, tok_oid=wire.OID_INT8),
    ]
    # a None value rides the null bitmap; the probe entry is present
    # with is_null → explicit NULL must overwrite, not keep
    changes[-1] = (
        "public", "metrics", "UPDATE",
        [("metric_id", "m4", wire.OID_TEXT)],
        [("n_tokens", None, wire.OID_INT8)],
    )
    store = _apply(spark, tmpdir_path, changes, CFG_TEXT)
    assert _state(store)["m4"] == ("d", None)


def test_old_snapshot_readable_after_widening(spark, tmpdir_path):
    """Batch 1 commits a narrow snapshot; batch 2 widens but only
    rewrites affected buckets — the merged read spans narrow AND wide
    parquet under the wide schema (Spark 4 parquet type promotion)."""
    changes = [
        mrow("INSERT", f"k{i}", "x", i) for i in range(12)
    ]
    widen = [
        mrow("INSERT", "w1", "y", BIG, tok_oid=wire.OID_INT8),
    ]
    frames = encode_routed_changes(changes + widen, CFG_TEXT, txn_every=2)
    import pyarrow.parquet as pq

    path = os.path.join(tmpdir_path, "frames.parquet")
    pq.write_table(_frames_table(frames), path)
    fdf = spark.read.parquet(path)
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "table"), metrics_schema(),
        num_buckets=4,
    )
    pipe = IngestPipeline(spark, store, CFG_TEXT)
    cut = frames[-2][0]
    pipe.apply_frames(fdf.where(f"frame_seq < {cut}"), batch_id=1)
    assert store.schema.column("n_tokens").spark_type == "int"
    pipe.apply_frames(fdf, batch_id=2)
    assert store.schema.column("n_tokens").spark_type == "bigint"
    got = _state(store)
    assert got["w1"] == ("y", BIG)
    assert all(got[f"k{i}"] == ("x", i) for i in range(12))
    # time travel to the pre-widening snapshot keeps the narrow schema
    old = store.read(as_of=1).drop("_bucket")
    assert dict(old.dtypes)["n_tokens"] == "int"


def test_evolved_schema_rules(spark, tmpdir_path):
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), metrics_schema(),
        num_buckets=2,
    )
    # lossless widening
    ev = store.evolved_schema([("n_tokens", wire.OID_INT8)])
    assert ev.column("n_tokens").spark_type == "bigint"
    assert not ev.column("n_tokens").is_key
    # additive still works alongside
    ev2 = store.evolved_schema(
        [("n_tokens", wire.OID_INT8), ("score", wire.OID_FLOAT8)]
    )
    assert ev2.column("score").spark_type == "double"
    # same oid: no-op
    assert store.evolved_schema(
        [("n_tokens", wire.OID_INT4)]
    ).column("n_tokens").spark_type == "int"
    # narrower straggler against an int column: keep the store type
    assert store.evolved_schema(
        [("n_tokens", wire.OID_INT2)]
    ).column("n_tokens").spark_type == "int"
    # key column type change: loud
    with pytest.raises(ValueError, match="key column"):
        store.evolved_schema([("metric_id", wire.OID_INT8)])
    # lossy change: loud
    with pytest.raises(ValueError, match="widening"):
        store.evolved_schema([("n_tokens", wire.OID_TEXT)])


def test_decoder_diverts_mismatched_oid(spark, tmpdir_path):
    """Unit view: after the ALTER, typed n_tokens reads ABSENT for
    new-oid rows (raw bytes live in the probe), so no stale-width
    parse can ever happen."""
    from pg_pb3_ld_spark.operators.decode import decode_typed_changes

    frames = encode_routed_changes(WIDEN_CHANGES[:4], CFG_BIN, txn_every=2)
    import pyarrow.parquet as pq

    path = os.path.join(tmpdir_path, "frames.parquet")
    pq.write_table(_frames_table(frames), path)
    fdf = spark.read.parquet(path)
    typed = decode_typed_changes(
        fdf, metrics_schema(), CFG_BIN, parallelism=2
    )
    rows = {
        r["metric_id"]: r
        for r in typed.where("op = 'INSERT'").collect()
    }
    assert rows["m1"]["n_tokens"] == 100 and rows["m1"]["n_tokens_set"]
    assert rows["m3"]["n_tokens"] is None
    assert not rows["m3"]["n_tokens_set"]
    assert "n_tokens" in (rows["m3"]["_x_names"] or [])
    i = list(rows["m3"]["_x_names"]).index("n_tokens")
    assert int(rows["m3"]["_x_oids"][i]) == wire.OID_INT8


def test_key_type_change_raises_in_decoder(spark, tmpdir_path):
    """A DELETE carries only key_fields (no probe) — the decoder must
    refuse a key oid change outright."""
    from pg_pb3_ld_spark.operators.decode import decode_typed_changes

    changes = [
        ("public", "metrics", "INSERT",
         [("metric_id", "m1", wire.OID_TEXT)],
         [("label", "a", wire.OID_TEXT)]),
        ("public", "metrics", "DELETE",
         [("metric_id", 12, wire.OID_INT8)], []),
    ]
    frames = encode_routed_changes(changes, CFG_TEXT, txn_every=2)
    import pyarrow.parquet as pq

    path = os.path.join(tmpdir_path, "frames.parquet")
    pq.write_table(_frames_table(frames), path)
    fdf = spark.read.parquet(path)
    typed = decode_typed_changes(
        fdf, metrics_schema(), CFG_TEXT, parallelism=2
    )
    with pytest.raises(Exception, match="key column"):
        typed.collect()
