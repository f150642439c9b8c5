"""SnapshotStore.verify() — the table audit: clean stores pass, and
each corruption class (missing files, row drift, misplaced rows,
zone-map violations, duplicate keys) is detected by its named check.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.schema import (
    TargetColumn, TargetSchema,
)
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.sinks.store import SnapshotStore


def _schema():
    return TargetSchema(
        "transcripts",
        [
            TargetColumn("conv_id", wire.OID_TEXT, "string", is_key=True),
            TargetColumn("turn_idx", wire.OID_INT4, "int", is_key=True),
            TargetColumn("text", wire.OID_TEXT, "string"),
            TargetColumn("score", wire.OID_INT4, "int"),
        ],
    )


def _batch(spark, n=80):
    rows = [
        (f"c{i % 11}", i // 11, "PATCH", f"t{i}", True, i % 7, True,
         1000 + i, 1000 + i, 1)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, kind string, "
        "text string, text_set boolean, score int, score_set boolean, "
        "last_lsn long, last_frame_seq long, n_changes long",
    )


@pytest.fixture()
def store(spark, tmpdir_path):
    st = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), _schema(),
        num_buckets=4, bucket_fn="md5", zonemap_cols=["score"],
    )
    st.merge(_batch(spark), batch_id=1)
    st.refresh()
    return st


def _bucket_dir(store, b):
    rel = store._meta["files"][str(b)]
    return os.path.join(store.root, rel)


def test_clean_store_passes(store):
    rep = store.verify(deep=True)
    assert rep["ok"] and rep["findings"] == [] and rep["deep"]
    assert store.verify(deep=False)["ok"]


def test_missing_bucket_dir_detected(store):
    b = sorted(int(k) for k in store._meta["files"])[0]
    shutil.rmtree(_bucket_dir(store, b))
    rep = store.verify()
    assert not rep["ok"]
    assert {"kind": "missing_data", "bucket": b} in rep["findings"]


def test_row_count_drift_detected(store):
    b = sorted(int(k) for k in store._meta["files"])[0]
    d = _bucket_dir(store, b)
    fn = next(
        os.path.join(dp, f)
        for dp, _dd, fs in os.walk(d) for f in fs
        if f.endswith(".parquet")
    )
    t = pq.read_table(fn)
    pq.write_table(t.slice(0, max(1, t.num_rows - 1)), fn)
    rep = store.verify()
    assert not rep["ok"]
    assert any(
        f["kind"] == "row_count" and f["bucket"] == b
        for f in rep["findings"]
    )


def _inject(store, b, conv_id, turn_idx, text, score):
    """Plant an extra parquet row file inside bucket b's dir."""
    d = _bucket_dir(store, b)
    t = pa.table({
        "conv_id": pa.array([conv_id], pa.string()),
        "turn_idx": pa.array([turn_idx], pa.int32()),
        "text": pa.array([text], pa.string()),
        "score": pa.array([score], pa.int32()),
    })
    pq.write_table(t, os.path.join(d, "planted.parquet"))


def test_misplaced_row_detected_and_explains_pruned_miss(spark, store):
    # find a conv_id whose bucket is NOT b, plant it inside b
    b = sorted(int(k) for k in store._meta["files"])[0]
    probe = spark.createDataFrame(
        [(f"x{i}",) for i in range(40)], "conv_id string"
    ).select("conv_id", store.bucket_expr("conv_id").alias("_b"))
    foreign = next(
        r["conv_id"] for r in probe.collect() if r["_b"] != b
    )
    _inject(store, b, foreign, 99, "planted", 3)
    rep = store.verify(deep=True)
    assert not rep["ok"]
    assert any(
        f["kind"] == "misplaced" and f["bucket"] == b
        for f in rep["findings"]
    )
    # the defect verify explains: a full read sees the row, a
    # bucket-pruned read of its DERIVED bucket misses it
    full = store.read_table().where(F.col("conv_id") == foreign).count()
    derived = next(
        r["_b"] for r in probe.collect() if r["conv_id"] == foreign
    )
    pruned = (
        store.read(buckets=[int(derived)])
        .where(F.col("conv_id") == foreign).count()
    )
    assert full == 1 and pruned == 0


def test_zonemap_violation_detected(spark, store):
    # plant a row of bucket b INTO bucket b (placement fine) with a
    # score outside the committed zone map
    b = sorted(int(k) for k in store._meta["files"])[0]
    probe = spark.createDataFrame(
        [(f"y{i}",) for i in range(40)], "conv_id string"
    ).select("conv_id", store.bucket_expr("conv_id").alias("_b"))
    native = next(r["conv_id"] for r in probe.collect() if r["_b"] == b)
    _inject(store, b, native, 98, "planted", 10_000)
    rep = store.verify(deep=True)
    assert not rep["ok"]
    assert any(
        f["kind"] == "zonemap" and f["bucket"] == b
        and f["col"] == "score"
        for f in rep["findings"]
    )


def test_duplicate_key_detected(spark, store):
    b = sorted(int(k) for k in store._meta["files"])[0]
    probe = spark.createDataFrame(
        [(f"c{i}",) for i in range(11)], "conv_id string"
    ).select("conv_id", store.bucket_expr("conv_id").alias("_b"))
    native = next(r["conv_id"] for r in probe.collect() if r["_b"] == b)
    # (native, 0) already exists from the batch; plant it again
    _inject(store, b, native, 0, "dup", 1)
    rep = store.verify(deep=True)
    assert not rep["ok"]
    assert any(
        f["kind"] == "duplicate_key" and f["bucket"] == b
        for f in rep["findings"]
    )


def test_shallow_skips_deep_checks(spark, store):
    b = sorted(int(k) for k in store._meta["files"])[0]
    probe = spark.createDataFrame(
        [(f"x{i}",) for i in range(40)], "conv_id string"
    ).select("conv_id", store.bucket_expr("conv_id").alias("_b"))
    foreign = next(
        r["conv_id"] for r in probe.collect() if r["_b"] != b
    )
    _inject(store, b, foreign, 99, "planted", 3)
    rep = store.verify(deep=False)
    # shallow still catches the row-count drift the planted file causes
    assert any(f["kind"] == "row_count" for f in rep["findings"])
    assert not any(f["kind"] == "misplaced" for f in rep["findings"])


def test_repair_misplaced_restores_pruned_reads(spark, store):
    b = sorted(int(k) for k in store._meta["files"])[0]
    probe = spark.createDataFrame(
        [(f"x{i}",) for i in range(40)], "conv_id string"
    ).select("conv_id", store.bucket_expr("conv_id").alias("_b"))
    foreign = next(r["conv_id"] for r in probe.collect() if r["_b"] != b)
    derived = next(
        int(r["_b"]) for r in probe.collect() if r["conv_id"] == foreign
    )
    _inject(store, b, foreign, 99, "planted", 3)
    before = sorted(map(tuple, store.read_table().collect()))
    hwm_before = store.hwm()

    rep = store.repair_misplaced()
    store.refresh()
    assert rep["moved_rows"] == 1 and rep["repaired_buckets"] >= 2
    # placement fixed: deep verify clean, pruned read finds the row
    audit = store.verify(deep=True)
    assert audit["ok"], audit["findings"]
    assert (
        store.read(buckets=[derived])
        .where(F.col("conv_id") == foreign).count() == 1
    )
    # content identical, watermark untouched, parent still readable
    assert sorted(map(tuple, store.read_table().collect())) == before
    assert store.hwm() == hwm_before
    assert store.read_table(as_of=rep["snapshot_id"] - 1).count() == \
        len(before)


def test_repair_noop_on_clean_store(store):
    rep = store.repair_misplaced()
    assert rep.get("skipped")


def test_repair_does_not_adjudicate_duplicates(spark, store):
    b = sorted(int(k) for k in store._meta["files"])[0]
    probe = spark.createDataFrame(
        [(f"c{i}",) for i in range(11)], "conv_id string"
    ).select("conv_id", store.bucket_expr("conv_id").alias("_b"))
    native = next(r["conv_id"] for r in probe.collect() if r["_b"] == b)
    _inject(store, b, native, 0, "dup", 1)
    rep = store.repair_misplaced()
    assert rep.get("skipped")  # placement is fine; dup keys remain
    audit = store.verify(deep=True)
    assert any(f["kind"] == "duplicate_key" for f in audit["findings"])


def test_rebucket_preserves_state_watermark_and_resumes(
    spark, store, tmpdir_path
):
    before = sorted(map(tuple, store.read_table().collect()))
    hwm = store.hwm()
    new = store.rebucket(os.path.join(tmpdir_path, "n"), num_buckets=9)
    # geometry migrated, content identical, watermark preserved
    assert new.num_buckets == 9 and store.num_buckets == 4
    assert new._meta["bucket_fn"] == "md5"
    assert new.hwm() == hwm
    assert sorted(map(tuple, new.read_table().collect())) == before
    assert new.verify(deep=True)["ok"]
    # old store intact for rollback
    assert sorted(map(tuple, store.read_table().collect())) == before
    # replaying an ALREADY-APPLIED batch against the new store is a
    # no-op (exactly-once across the migration): merge with the same
    # hwm_override is dropped by the watermark
    m = new.merge(
        _batch(spark).withColumn("last_lsn", F.col("last_lsn") - 1000)
        .withColumn("last_frame_seq", F.col("last_frame_seq") - 1000),
        batch_id=9, hwm_override=(hwm[0] - 1, hwm[1] - 1),
    )
    new.refresh()
    assert new.hwm() == hwm  # watermark never regresses
