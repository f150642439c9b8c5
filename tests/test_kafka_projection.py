"""Kafka record projection tests — no broker needed.

``project_kafka_records`` is the production transport's mapping from
Kafka's record shape to the engine's (frame_seq, lsn, frame) contract;
these tests pin the header-LSN extraction, the offset fallback, and
end-to-end decodability of the projected frames.
"""

from __future__ import annotations

import struct

import numpy as np

from pg_pb3_ld_spark.sources.frames import project_kafka_records

KAFKA_DDL = (
    "offset long, value binary, "
    "headers array<struct<key: string, value: binary>>"
)


def test_header_lsn_wins_over_offset(spark):
    rows = [
        (0, b"frame0", [("lsn", struct.pack(">q", 5000)), ("other", b"x")]),
        (1, b"frame1", [("other", b"x"), ("lsn", struct.pack(">q", 6000))]),
    ]
    df = spark.createDataFrame(rows, KAFKA_DDL)
    got = {r["frame_seq"]: r for r in project_kafka_records(df).collect()}
    assert got[0]["lsn"] == 5000
    assert got[1]["lsn"] == 6000
    assert bytes(got[0]["frame"]) == b"frame0"


def test_offset_fallback_without_lsn_header(spark):
    rows = [
        (7, b"f", []),            # no headers at all
        (8, b"g", [("k", b"v")]),  # headers but no 'lsn' key
        (9, b"h", None),           # null headers column
    ]
    df = spark.createDataFrame(rows, KAFKA_DDL)
    got = {r["frame_seq"]: r["lsn"] for r in project_kafka_records(df).collect()}
    assert got == {7: 7, 8: 8, 9: 9}


def test_projected_frames_decode_end_to_end(spark):
    """Wire frames shipped as Kafka values decode identically to the
    parquet landing-zone path."""
    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.generator import generate_stream
    from pg_pb3_ld_spark.operators.decode import decode_typed_changes
    from pg_pb3_ld_spark.schema import transcripts_schema

    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    stream = generate_stream(seed=17, n_convs=4, max_turns=3, n_extra_txns=5)
    rows = [
        (seq, bytes(frame), [("lsn", struct.pack(">q", lsn))])
        for seq, lsn, frame in stream.frames
    ]
    kafka_df = spark.createDataFrame(rows, KAFKA_DDL)
    frames = project_kafka_records(kafka_df)
    got_lsns = sorted(r["lsn"] for r in frames.select("lsn").collect())
    assert got_lsns == sorted(f[1] for f in stream.frames)
    typed = decode_typed_changes(frames, stream.schema, cfg)
    ops = [r["op"] for r in typed.collect()]
    assert ops.count("INSERT") + ops.count("UPDATE") + ops.count("DELETE") \
        == stream.n_changes
