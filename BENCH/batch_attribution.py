#!/usr/bin/env python3
"""Attribute the local[32] cdc_apply gap: 1-batch vs 4-batch cost
(VERDICT round-2 ask #6).

The official bench applies the stream in 4 prefix batches (replay
semantics); each batch pays ~3 Spark actions of fixed scheduling cost
plus a watermark-filtered re-scan of earlier frames.  This script
measures the same cached stream applied as ONE batch and as FOUR
prefix batches, interleaved best-of-N with a quiet gate, and prints
the per-variant numbers so the fixed-cost delta is explicit.

Writes nothing; paste results into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_ATTR_ROUNDS", "3"))


def wait_quiet(threshold=2.0, max_wait=600):
    waited = 0
    while os.getloadavg()[0] > threshold and waited < max_wait:
        time.sleep(10)
        waited += 10
    return round(os.getloadavg()[0], 2)


def main():
    import bench
    from pyspark.sql import functions as F

    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.pipeline import IngestPipeline
    from pg_pb3_ld_spark.schema import transcripts_schema
    from pg_pb3_ld_spark.session import build_session
    from pg_pb3_ld_spark.sinks.store import SnapshotStore

    frames_path, info = bench.cached_stream()
    n_frames = info["n_frames"]
    n_changes = info["n_changes"]
    spark = build_session(
        app_name="batch-attr", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    workdir = tempfile.mkdtemp(prefix="pb3ld_attr_")
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    frames = spark.read.parquet(frames_path)

    # warmup
    warm = SnapshotStore.create(
        spark, os.path.join(workdir, "warm"), transcripts_schema(),
        num_buckets=max(CPUS, 8),
    )
    IngestPipeline(spark, warm, cfg).apply_frames(
        frames.where(F.col("frame_seq") < max(n_frames // 20, 200)),
        batch_id=0,
    )

    def apply_n_batches(tag: str, n_batches: int) -> float:
        store = SnapshotStore.create(
            spark, os.path.join(workdir, tag), transcripts_schema(),
            num_buckets=max(CPUS, 8),
        )
        pipe = IngestPipeline(spark, store, cfg)
        t0 = time.time()
        if n_batches <= 1:
            pipe.apply_frames(frames, batch_id=1)
        else:
            step = (n_frames + n_batches - 1) // n_batches
            for b in range(1, n_batches):
                pipe.apply_frames(
                    frames.where(F.col("frame_seq") < b * step), batch_id=b
                )
            pipe.apply_frames(frames, batch_id=n_batches)
        return time.time() - t0

    results: dict[int, list] = {1: [], 4: []}
    try:
        for r in range(ROUNDS):
            for nb in (1, 4):  # interleaved: bursts hit both variants
                load = wait_quiet()
                el = apply_n_batches(f"t{nb}_{r}", nb)
                results[nb].append(
                    {"elapsed": round(el, 2), "load": load,
                     "ev_s": round(n_changes / el, 0)}
                )
                print(f"run {r} {nb}-batch: {el:.2f}s "
                      f"({n_changes / el:,.0f} ev/s, load {load})",
                      flush=True)
        best1 = min(r["elapsed"] for r in results[1])
        best4 = min(r["elapsed"] for r in results[4])
        print(json.dumps({
            "n_changes": n_changes,
            "cpus": CPUS,
            "one_batch_best_sec": best1,
            "four_batch_best_sec": best4,
            "fixed_cost_delta_sec": round(best4 - best1, 2),
            "one_batch_ev_s": round(n_changes / best1, 0),
            "four_batch_ev_s": round(n_changes / best4, 0),
            "runs": results,
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
