"""applyInPandasWithState conversation tracking: state must survive
ACROSS micro-batches (the whole point of a custom stateful op)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet_dir
from pg_pb3_ld_spark.operators.decode import decode_typed_changes
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.streaming.sessions import track_conversations


def test_state_accumulates_across_micro_batches(spark, tmpdir_path):
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    stream = generate_stream(seed=81, n_convs=4, max_turns=6, n_extra_txns=12)
    land = os.path.join(tmpdir_path, "land")
    n_files = write_frames_parquet_dir(stream, land, n_files=3)
    assert n_files == 3

    frames = (
        spark.readStream.schema("frame_seq long, lsn long, frame binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    changes = decode_typed_changes(frames, transcripts_schema(), cfg).where(
        F.col("op").isin("INSERT", "UPDATE", "DELETE")
    ).select("conv_id", "turn_idx", "op", "lsn")
    out = track_conversations(changes)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from conv_progress").collect()
    assert rows, "stateful operator emitted nothing"
    assert all(not r["done"] for r in rows)

    # per conversation: cumulative counts are non-decreasing across
    # batches and the FINAL emission matches the whole-stream truth
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    # truth from a batch read of the same frames
    truth = (
        decode_typed_changes(
            spark.read.schema("frame_seq long, lsn long, frame binary")
            .parquet(land),
            transcripts_schema(), cfg,
        )
        .where(F.col("op").isin("INSERT", "UPDATE", "DELETE"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("turn_idx").alias("nt"),
            F.max("lsn").alias("ml"),
        )
        .collect()
    )
    truth = {r["conv_id"]: r for r in truth}
    multi_batch_convs = 0
    for conv, emissions in by_conv.items():
        emissions.sort(key=lambda r: r["n_changes"])
        if len(emissions) > 1:
            multi_batch_convs += 1
        final = emissions[-1]
        t = truth[conv]
        assert final["n_changes"] == t["n"]
        assert final["n_turns"] == t["nt"]
        assert final["last_lsn"] == t["ml"]
    # the hot conversation spans files ⇒ state genuinely crossed
    # micro-batch boundaries for at least one group
    assert multi_batch_convs >= 1


def test_uncommitted_tail_semantics(spark, tmpdir_path):
    """Pin the documented split across a mid-transaction batch cut:
    the sessions view reads the UNGATED stream (at-least-once — the
    uncommitted tail IS counted), while the exactly-once apply path
    holds the same tail back until its COMMIT arrives."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_pb3_ld_spark.pb3 import wire
    from pg_pb3_ld_spark.pb3.encoder import (
        FieldValue, WireBatcher, encode_field_set, encode_insert,
        encode_table,
    )
    from pg_pb3_ld_spark.pb3.pgtypes import encode_value
    from pg_pb3_ld_spark.pipeline import IngestPipeline
    from pg_pb3_ld_spark.sinks.store import SnapshotStore

    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    td = encode_table("public", "transcripts")

    def _ins(b, conv, turn):
        cols = [
            FieldValue("conv_id", conv.encode(), wire.OID_TEXT),
            FieldValue(
                "turn_idx", encode_value(turn, wire.OID_INT4, True),
                wire.OID_INT4, is_binary=True,
            ),
            FieldValue("text", f"{conv}#{turn}".encode(), wire.OID_TEXT),
        ]
        b.change(
            wire.WMSG_INSERT,
            encode_insert(td, encode_field_set(cols, cfg.type_oids_mode)),
        )

    b = WireBatcher(cfg)
    b.begin_txn(); _ins(b, "c0", 0); _ins(b, "c0", 1); b.commit_txn()
    committed = list(b.frames())
    b.begin_txn(); _ins(b, "c0", 2); _ins(b, "c1", 0)
    b.cut()  # producer crash before COMMIT — uncommitted tail frame
    tail = [f for f in b.frames() if f not in committed]
    assert tail, "cut() must flush the buffered mid-txn frame"

    land = os.path.join(tmpdir_path, "land")
    os.makedirs(land)

    def _write(name, frames, seq0, mtime):
        p = os.path.join(land, name)
        pq.write_table(
            pa.table({
                "frame_seq": pa.array(
                    range(seq0, seq0 + len(frames)), pa.int64()
                ),
                "lsn": pa.array([l for l, _ in frames], pa.int64()),
                "frame": pa.array([fr for _, fr in frames], pa.binary()),
            }),
            p,
        )
        os.utime(p, (mtime, mtime))

    now = time.time()
    _write("part-000.parquet", committed, 0, now - 60)
    _write("part-001.parquet", tail, len(committed), now)

    # ungated sessions view: the tail counts (at-least-once)
    frames = (
        spark.readStream.schema("frame_seq long, lsn long, frame binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    changes = decode_typed_changes(frames, transcripts_schema(), cfg).where(
        F.col("op").isin("INSERT", "UPDATE", "DELETE")
    ).select("conv_id", "turn_idx", "op", "lsn")
    q = (
        track_conversations(changes)
        .writeStream.format("memory").queryName("tail_progress")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ck"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from tail_progress").collect()
    final = {}
    for r in rows:
        cur = final.get(r["conv_id"])
        if cur is None or r["n_changes"] > cur["n_changes"]:
            final[r["conv_id"]] = r
    assert final["c0"]["n_changes"] == 3       # includes uncommitted turn 2
    assert final["c0"]["max_turn"] == 2
    assert final["c1"]["n_changes"] == 1       # uncommitted-only conv visible

    # exactly-once apply path on the SAME frames: tail held back
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(),
        num_buckets=2,
    )
    IngestPipeline(spark, store, cfg).apply_frames(
        spark.read.schema("frame_seq long, lsn long, frame binary")
        .parquet(land),
        batch_id=1,
    )
    applied = {
        (r["conv_id"], r["turn_idx"]) for r in store.read_table().collect()
    }
    assert applied == {("c0", 0), ("c0", 1)}   # no uncommitted rows
