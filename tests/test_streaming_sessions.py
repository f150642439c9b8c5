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
