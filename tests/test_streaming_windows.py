"""Watermarked windowed aggregation — streaming-only semantics.

`streaming/windows.py` runs the same plan batch and streaming; the
batch algebra is oracle-checked by the `event_window_agg` driver
query.  What only a real stream can pin:

* append mode emits a window ONCE, only after the watermark passes
  its end;
* a row arriving later than (max event time − watermark delay) whose
  window is already finalized is DROPPED, not double-emitted.

The file source with ``maxFilesPerTrigger=1`` gives deterministic
micro-batch boundaries (files feed oldest-mtime first); the watermark
advances between batches from the previous batch's max event time.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import Row, functions as F

from pg_pb3_ld_spark.streaming.windows import windowed_rates

DDL = "ts timestamp, event_type string, value double"


def _write_file(spark, d, rows, name):
    # the streaming file source lists plain files, not nested parquet
    # output dirs — stage the write, then move the single part file in
    import glob
    import shutil

    stage = os.path.join(d, f"_stage_{name}")
    spark.createDataFrame(
        [Row(ts=t, event_type=e, value=v) for t, e, v in rows], DDL
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
    shutil.move(part, os.path.join(d, f"{name}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    # distinct mtimes → deterministic file-source ordering
    time.sleep(1.1)


def _run(spark, src_dir, ckpt, out_table):
    sdf = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = windowed_rates(
        sdf, window="1 hour", watermark="30 minutes"
    ).select(
        F.col("window.start").alias("ws"), "event_type", "n_events"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.fixture()
def dirs(tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    os.makedirs(src, exist_ok=True)
    return src, os.path.join(tmpdir_path, "ckpt")


def ts(h, m=0):
    import datetime

    return datetime.datetime(2026, 1, 1, h, m)


def test_append_emits_only_watermark_closed_windows(spark, dirs):
    src, ckpt = dirs
    # batch 1: events in the 10:00 window, max event time 12:00
    _write_file(
        spark, src,
        [(ts(10, 5), "click", 1.0), (ts(10, 40), "click", 1.0),
         (ts(12, 0), "view", 1.0)],
        "f1",
    )
    # batch 2: advances event time to 14:00 → watermark 13:30 closes
    # the 10:00 and 12:00 windows
    _write_file(spark, src, [(ts(14, 0), "view", 1.0)], "f2")
    _run(spark, src, ckpt, "win_close")
    got = {
        (r["ws"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_close").collect()
    }
    # the 14:00 window is still OPEN (watermark never passed its end)
    assert got == {(10, "click"): 2, (12, "view"): 1}


def test_late_row_after_window_finalized_is_dropped(spark, dirs):
    """The watermark guarantee is one-directional: a late row whose
    window is still in state may be merged, but once the window has
    been EVICTED (emitted in append mode), a later arrival for it
    must be dropped — never re-emitted as a duplicate window."""
    src, ckpt = dirs
    _write_file(
        spark, src,
        [(ts(10, 5), "click", 1.0), (ts(12, 0), "view", 1.0)],
        "f1",
    )
    # batch 2 runs with watermark 11:30 → its end evicts+emits the
    # 10:00 window at n=1
    _write_file(spark, src, [(ts(14, 0), "view", 1.0)], "f2")
    # batch 3 runs with watermark 13:30: the 10:15 row's window is
    # already finalized — it MUST be dropped
    _write_file(
        spark, src, [(ts(10, 15), "click", 1.0), (ts(16, 0), "view", 1.0)],
        "f3",
    )
    _run(spark, src, ckpt, "win_late")
    got = {
        (r["ws"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_late").collect()
    }
    # 10:00 window stays at n=1 (no duplicate emission, late row
    # dropped); 16:00 window still open at stream end
    assert got == {(10, "click"): 1, (12, "view"): 1, (14, "view"): 1}
