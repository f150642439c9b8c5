"""Unit tests for the Iceberg SQL builders and frame sources."""

from __future__ import annotations

from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.iceberg import (
    add_column_sql,
    create_table_sql,
    merge_sql,
)
from pg_pb3_ld_spark.sources.frames import parquet_frames


def test_merge_sql_shape():
    sql = merge_sql(transcripts_schema(), "lake.chat.transcripts")
    assert "MERGE INTO lake.chat.transcripts t" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    assert "WHEN MATCHED AND s.kind = 'DELETE' THEN DELETE" in sql
    # partial-update semantics: column updates gated on <c>_set
    assert (
        "t.text = CASE WHEN s.kind = 'REPLACE' OR s.text_set "
        "THEN s.text ELSE t.text END" in sql
    )
    assert "WHEN NOT MATCHED AND s.kind != 'DELETE' THEN INSERT" in sql
    # key columns never appear in UPDATE SET
    assert "t.conv_id = CASE" not in sql


def test_create_and_evolve_sql():
    ddl = create_table_sql(transcripts_schema(), "lake.t", buckets=512)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(512, conv_id))" in ddl
    assert "format-version'='2" in ddl
    assert add_column_sql("lake.t", "model", "string") == (
        "ALTER TABLE lake.t ADD COLUMN model string"
    )


def test_parquet_frames_roundtrip(spark, tmpdir_path):
    import os

    from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet_dir

    stream = generate_stream(seed=3, n_convs=4, max_turns=4, n_extra_txns=5)
    d = os.path.join(tmpdir_path, "frames")
    write_frames_parquet_dir(stream, d, n_files=2)
    df = parquet_frames(spark, d)
    assert df.count() == len(stream.frames)
    assert df.schema.simpleString() == (
        "struct<frame_seq:bigint,lsn:bigint,frame:binary>"
    )
    sdf = parquet_frames(spark, d, streaming=True, max_files_per_trigger=1)
    assert sdf.isStreaming


def test_binaryfile_source_end_to_end(spark, tmpdir_path):
    """Raw one-file-per-frame landing zone → binaryFile source →
    full pipeline: final table matches the python oracle."""
    import os

    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.generator import generate_stream, write_frames_binary_dir
    from pg_pb3_ld_spark.pipeline import IngestPipeline
    from pg_pb3_ld_spark.schema import transcripts_schema
    from pg_pb3_ld_spark.sinks.store import SnapshotStore
    from pg_pb3_ld_spark.sources.frames import binaryfile_frames

    stream = generate_stream(seed=61, n_convs=5, max_turns=4, n_extra_txns=8)
    land = os.path.join(tmpdir_path, "land")
    n = write_frames_binary_dir(stream, land)
    frames = binaryfile_frames(spark, land)
    assert frames.count() == n
    got = {
        (r["frame_seq"], r["lsn"]) for r in frames.select("frame_seq", "lsn").collect()
    }
    assert got == {(s, l) for s, l, _ in stream.frames}

    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(), num_buckets=4
    )
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    IngestPipeline(spark, store, cfg).apply_frames(frames, batch_id=1)
    final = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in store.read_table().collect()
    }
    assert final == {k: v["text"] for k, v in stream.oracle.items()}


def test_key_moving_stream_matches_oracle(spark, tmpdir_path):
    """Generator streams with key-changing UPDATEs (key_move_prob>0)
    replay to the python oracle's final state — the split
    DELETE(old)+INSERT(new) path under realistic traffic, replayed
    in two overlapping batches for the exactly-once interaction."""
    import os

    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
    from pg_pb3_ld_spark.pipeline import IngestPipeline
    from pg_pb3_ld_spark.schema import transcripts_schema
    from pg_pb3_ld_spark.sinks.store import SnapshotStore

    stream = generate_stream(
        seed=62, n_convs=8, max_turns=5, n_extra_txns=40, key_move_prob=0.15
    )
    fp = os.path.join(tmpdir_path, "frames.parquet")
    write_frames_parquet(stream, fp)
    frames = spark.read.parquet(fp)
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(), num_buckets=4
    )
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    pipe = IngestPipeline(spark, store, cfg)
    n = len(stream.frames)
    pipe.apply_frames(frames.where(f"frame_seq < {n // 2}"), batch_id=1)
    pipe.apply_frames(frames, batch_id=2)  # overlapping replay
    cols = [c.name for c in stream.schema.columns]
    final = {
        (r["conv_id"], r["turn_idx"]): tuple(
            r[c] for c in cols if c not in ("conv_id", "turn_idx", "ts")
        )
        for r in store.read_table().collect()
    }
    want = {
        k: tuple(
            v.get(c) for c in cols if c not in ("conv_id", "turn_idx", "ts")
        )
        for k, v in stream.oracle.items()
    }
    assert final == want
