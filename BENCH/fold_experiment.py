#!/usr/bin/env python3
"""Fold strategy experiment (VERDICT round-1 item 6).

The fold's ``max(struct(ord, value))`` aggregates compile to
SortAggregate (any var-width aggregation buffer does in Spark 4.x) —
per-partition sorts of the full decoded batch.  This script measures
the shipped fold against the credible alternatives on the real bench
stream so the choice is evidence, not taste:

  A. shipped: hash-partial **SortAggregate** with map-side combine
     (max(struct) per column);
  B. window variant: ONE sort per partition (all per-column
     ``last(...) ignorenulls`` + barrier max over the same window
     frame), no map-side combine — the full typed batch shuffles;
  C. two-phase: fixed-width hash agg of per-column winner ords
     (pure HashAggregate) + self-join to fetch values — the join
     re-shuffles the full batch without map-side collapse.

Run: python BENCH/fold_experiment.py [cores]
Writes one JSON line; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from pg_pb3_ld_spark.operators.fold import ORD_SHIFT, fold_changes


def _ord():
    return F.shiftleft(F.col("frame_seq"), ORD_SHIFT) + F.col("offset_idx")


def fold_window(typed, schema):
    """Variant B: one window sort per key does everything."""
    keys = [c.name for c in schema.key_columns]
    vals = [c.name for c in schema.value_columns]
    w = (
        Window.partitionBy(*keys)
        .orderBy(_ord())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cols = [F.col(k) for k in keys]
    barrier = F.max(
        F.when(
            F.col("op").isin("INSERT", "DELETE"),
            F.struct(_ord().alias("o"), F.col("op").alias("op")),
        )
    ).over(w)
    last_ord = F.max(_ord()).over(w)
    last_op = F.max(
        F.struct(_ord().alias("o"), F.col("op").alias("op"))
    ).over(w).getField("op")
    kind = (
        F.when(barrier.isNotNull() & (barrier.getField("op") == "DELETE"), "DELETE")
        .when(barrier.isNotNull(), "REPLACE")
        .otherwise("PATCH")
    )
    sel = [F.col(k) for k in keys] + [kind.alias("kind")]
    for c in vals:
        lv = F.last(
            F.when(F.col(f"{c}_set"), F.struct(_ord().alias("o"), F.col(c).alias("v"))),
            ignorenulls=True,
        ).over(w)
        valid = lv.isNotNull() & (
            barrier.isNull() | (lv.getField("o") >= barrier.getField("o"))
        )
        sel.append(F.when(valid, lv.getField("v")).alias(c))
        sel.append((valid | barrier.isNotNull()).alias(f"{c}_set"))
    sel += [
        F.max(F.struct(_ord().alias("o"), F.col("lsn").alias("l"))).over(w)
        .getField("l").alias("last_lsn"),
        F.shiftright(last_ord, ORD_SHIFT).alias("last_frame_seq"),
        F.count(F.lit(1)).over(w).alias("n_changes"),
    ]
    return (
        typed.select(*sel, _ord().alias("_o"), last_ord.alias("_lo"))
        .where(F.col("_o") == F.col("_lo"))
        .drop("_o", "_lo")
    )


def fold_two_phase(typed, schema):
    """Variant C: fixed-width hash agg of winner ords, then join."""
    keys = [c.name for c in schema.key_columns]
    vals = [c.name for c in schema.value_columns]
    aggs = [
        F.max(_ord()).alias("_last"),
        F.max(
            F.when(F.col("op").isin("INSERT", "DELETE"), _ord())
        ).alias("_barrier_ord"),
        F.max(F.when(F.col("op") == "DELETE", _ord())).alias("_del_ord"),
        F.max("lsn").alias("last_lsn"),
        F.count(F.lit(1)).alias("n_changes"),
    ] + [
        F.max(F.when(F.col(f"{c}_set"), _ord())).alias(f"_o_{c}")
        for c in vals
    ]
    winners = typed.groupBy(*keys).agg(*aggs)  # pure HashAggregate
    j = typed.select(
        *keys, _ord().alias("_ord"), *[f for c in vals for f in (c, f"{c}_set")]
    ).join(winners, keys)
    picked = j.groupBy(*keys).agg(
        F.first("_last").alias("_last"),
        F.first("_barrier_ord").alias("_barrier_ord"),
        F.first("_del_ord").alias("_del_ord"),
        F.first("last_lsn").alias("last_lsn"),
        F.first("n_changes").alias("n_changes"),
        *[
            F.max(
                F.when(F.col("_ord") == F.col(f"_o_{c}"), F.col(c))
            ).alias(c)
            for c in vals
        ],
        *[F.first(f"_o_{c}").alias(f"_o_{c}") for c in vals],
    )
    kind = (
        F.when(
            F.col("_barrier_ord").isNotNull()
            & (F.col("_barrier_ord") == F.col("_del_ord")), "DELETE"
        )
        .when(F.col("_barrier_ord").isNotNull(), "REPLACE")
        .otherwise("PATCH")
    )
    sel = [F.col(k) for k in keys] + [kind.alias("kind")]
    for c in vals:
        valid = F.col(f"_o_{c}").isNotNull() & (
            F.col("_barrier_ord").isNull()
            | (F.col(f"_o_{c}") >= F.col("_barrier_ord"))
        )
        sel.append(F.when(valid, F.col(c)).alias(c))
        sel.append((valid | F.col("_barrier_ord").isNotNull()).alias(f"{c}_set"))
    sel += [
        F.col("last_lsn"),
        F.shiftright(F.col("_last"), ORD_SHIFT).alias("last_frame_seq"),
        F.col("n_changes"),
    ]
    return picked.select(*sel)


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from pg_pb3_ld_spark.session import build_session
    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.operators.decode import decode_typed_changes
    from pg_pb3_ld_spark.operators.txn import (
        batch_summary_typed, gate_by_commit_watermark,
    )
    from pg_pb3_ld_spark.pipeline import PROBE_COLS
    from pg_pb3_ld_spark.schema import transcripts_schema
    import bench

    while os.getloadavg()[0] > 2.0:
        time.sleep(15)
    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    frames_path, info = bench.cached_stream()
    frames = spark.read.parquet(frames_path)
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    schema = transcripts_schema()
    typed = decode_typed_changes(frames, schema, cfg, parallelism=cores).persist()
    summary = batch_summary_typed(typed)
    data = typed.where(F.col("table_name") == schema.table).drop(*PROBE_COLS)
    gated = gate_by_commit_watermark(data, summary["commit_ord"], True)

    def force(df):
        # checksum over every output column defeats pruning without
        # collecting row data (bit_xor: order-independent, no overflow)
        return df.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    variants = {
        "A_shipped_sortagg": lambda: fold_changes(gated, schema),
        "B_window": lambda: fold_window(gated, schema),
        "C_two_phase_join": lambda: fold_two_phase(gated, schema),
    }
    results = {}
    checks = {}
    for name, fn in variants.items():
        fn() and None  # build once to JIT plan paths
        times = []
        for r in range(3):
            t0 = time.time()
            row = force(fn())
            times.append(time.time() - t0)
            checks[name] = (row["n"], row["h"])
        results[name] = round(min(times), 2)
    agree = len({v for v in checks.values()}) == 1
    out = {
        "experiment": "fold strategy",
        "cores": cores,
        "n_changes": info["n_changes"],
        "best_sec": results,
        "outputs_identical": agree,
        "checksums": {k: list(map(int, v)) for k, v in checks.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
