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
