"""Compliance operators: keyed pseudonymization
(``compliance.pseudonymize``) and subject erasure through the real
snapshot store (``compliance.erase_subjects`` +
``shard_invalidation``) — the right-to-be-forgotten path an LLM
training corpus built from live conversation streams must discharge.
"""

import os

import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.compliance import (
    erase_subjects,
    pseudonym_token,
    pseudonymize,
    shard_invalidation,
    subject_erasure_batch,
)
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.schema import TargetColumn, TargetSchema
from pg_pb3_ld_spark.sinks.store import SnapshotStore


# ---------------------------------------------------------------- pseudonym


def _subjects_df(spark):
    return spark.createDataFrame(
        [
            (1, "user07", "by user07: hello from user07"),
            (2, "user07", "user07 says hi"),
            (3, "user21", "by user21: unrelated user07x mention"),
            (4, None, "no subject here"),
        ],
        "doc_id long, author string, body string",
    )


def test_pseudonym_token_stable_and_keyed(spark):
    df = spark.range(1).select(
        pseudonym_token(F.lit("user07"), "k1").alias("a"),
        pseudonym_token(F.lit("user07"), "k1").alias("b"),
        pseudonym_token(F.lit("user07"), "k2").alias("c"),
        pseudonym_token(F.lit("user21"), "k1").alias("d"),
        pseudonym_token(F.lit(None).cast("string"), "k1").alias("e"),
    )
    r = df.collect()[0]
    assert r["a"] == r["b"]                      # deterministic
    assert r["a"] != r["c"]                      # secret-keyed
    assert r["a"] != r["d"]                      # value-sensitive
    assert r["e"] is None                        # NULL stays NULL
    assert r["a"].startswith("subj_") and len(r["a"]) == 5 + 12


def test_pseudonymize_referential_integrity(spark):
    out = pseudonymize(
        _subjects_df(spark), "author", "s3cr3t", text_cols=("body",)
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    tok07 = by_id[1]["author"]
    # same subject -> same token in BOTH rows and inside the text
    assert by_id[2]["author"] == tok07
    assert by_id[1]["body"] == f"by {tok07}: hello from {tok07}"
    assert by_id[2]["body"] == f"{tok07} says hi"
    # different subject -> different token; row 3's own subject is
    # user21, so its literal 'user07x' substring is NOT scrubbed
    # (per-row own-subject scrub, documented)
    assert by_id[3]["author"] != tok07
    assert "user07x" in by_id[3]["body"]
    assert by_id[3]["body"].startswith(f"by {by_id[3]['author']}:")
    # NULL subject passes through untouched
    assert by_id[4]["author"] is None
    assert by_id[4]["body"] == "no subject here"


def test_pseudonymize_pure_projection_plan(spark):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        pseudonymize(
            _subjects_df(spark), "author", "k", text_cols=("body",)
        ).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    for node in ("EvalPython", "MapInPandas", "MapInArrow"):
        assert node not in plan


# ------------------------------------------------------------------ erasure


def _schema():
    return TargetSchema(
        "transcripts",
        [
            TargetColumn("conv_id", wire.OID_TEXT, "string", is_key=True),
            TargetColumn("turn_idx", wire.OID_INT4, "int", is_key=True),
            TargetColumn("text", wire.OID_TEXT, "string"),
        ],
    )


def _batch(spark, rows):
    # rows: (conv_id, turn_idx, kind, text, lsn)
    return spark.createDataFrame(
        [(c, t, k, x, x is not None, lsn, lsn, 1)
         for (c, t, k, x, lsn) in rows],
        "conv_id string, turn_idx int, kind string, text string, "
        "text_set boolean, last_lsn long, last_frame_seq long, "
        "n_changes long",
    )


@pytest.fixture()
def store(spark, tmpdir_path):
    st = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "era"), _schema(),
        num_buckets=4, bucket_fn="md5", changelog=True,
    )
    st.merge(_batch(spark, [
        ("c1", 0, "PATCH", "a", 100),
        ("c1", 1, "PATCH", "b", 101),
        ("c2", 0, "PATCH", "c", 102),
        ("c3", 0, "PATCH", "d", 103),
    ]), batch_id=1)
    st.merge(_batch(spark, [
        ("c2", 1, "PATCH", "e", 200),
        ("c3", 0, "DELETE", None, 201),   # c3 fully gone pre-erasure
    ]), batch_id=2)
    st.refresh()
    return st


def test_erasure_removes_all_subject_rows(spark, store):
    subj = spark.createDataFrame(
        [("c1",), ("c3",), ("ghost",)], "conv_id string"
    )
    hwm_before = store.hwm()[0]
    metrics = erase_subjects(store, subj, batch_id=3)
    assert not metrics.get("skipped")
    store.refresh()
    left = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in store.read_table().collect()
    }
    # c1 erased (2 live rows); c3 already dead; ghost never existed;
    # c2 untouched
    assert left == {("c2", 0, "c"), ("c2", 1, "e")}
    assert store.hwm()[0] == hwm_before + 1      # ordinary commit


def test_erasure_is_idempotent_and_changelog_visible(spark, store):
    subj = spark.createDataFrame([("c1",)], "conv_id string")
    snap_before = store.snapshot_id
    erase_subjects(store, subj, batch_id=3)
    store.refresh()
    # the erasure is an ordinary commit: the change feed shows DELETEs
    feed = store.read_changes(since_snapshot=snap_before).collect()
    assert {(r["conv_id"], r["turn_idx"], r["change_type"])
            for r in feed} == {("c1", 0, "DELETE"), ("c1", 1, "DELETE")}
    # second request for the same subject: no live rows -> skipped
    m2 = erase_subjects(store, subj, batch_id=4)
    assert m2.get("skipped") is True


def test_erasure_batch_speaks_folded_schema(spark, store):
    subj = spark.createDataFrame([("c1",)], "conv_id string")
    b = subject_erasure_batch(store, subj)
    rows = b.collect()
    assert {r["conv_id"] for r in rows} == {"c1"}
    assert all(r["kind"] == "DELETE" for r in rows)
    assert all(not r["text_set"] and r["text"] is None for r in rows)
    assert all(r["last_lsn"] == store.hwm()[0] + 1 for r in rows)


def test_shard_invalidation_counts(spark):
    purged = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c9", 0)], "conv_id string, turn_idx int"
    )
    remaining = spark.createDataFrame(
        [("c2", 0), ("c2", 1)], "conv_id string, turn_idx int"
    )
    rep = shard_invalidation(purged, remaining, "conv_id", 4)
    rows = {r["shard"]: r for r in rep.collect()}
    assert sum(r["n_purged_rows"] for r in rows.values()) == 3
    assert sum(r["n_purged_convs"] for r in rows.values()) == 2
    assert sum(r["n_remaining_rows"] for r in rows.values()) == 2
    # full-outer: a shard with only-purged or only-remaining rows
    # still appears, zero-filled on the other side
    assert all(
        r["n_purged_rows"] >= 0 and r["n_remaining_rows"] >= 0
        for r in rows.values()
    )
    # partition invariance
    rep2 = shard_invalidation(
        purged.repartition(5), remaining.repartition(3), "conv_id", 4
    )
    assert sorted(map(tuple, rep.collect())) == sorted(
        map(tuple, rep2.collect())
    )
