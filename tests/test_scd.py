"""SCD2 history derived from the change data feed.

Pins the version semantics (open on INSERT/UPDATE, closed by the
key's next change of ANY type, nothing opened by DELETE), the
interval invariants (disjoint, ordered, ≤1 current per key), and the
two reconciliation equalities that make the relation trustworthy:
current versions ≡ the live store table, and ``scd2_as_of(S)`` ≡
``store.read_table(as_of=S)`` for every snapshot S.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pg_pb3_ld_spark.operators.scd import scd2_as_of, scd2_history
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

from tests.test_mor import _folded

KEYS = ["conv_id", "turn_idx"]
VALS = ["role", "text", "tool"]


def _store(spark, tmpdir_path, name="scd"):
    return SnapshotStore.create(
        spark, os.path.join(tmpdir_path, name), transcripts_schema(),
        num_buckets=2, changelog=True,
    )


def _hist(store):
    return scd2_history(store.read_changes(0), KEYS, VALS)


def _rows(df):
    return {
        (
            r["conv_id"], r["turn_idx"], r["text"],
            r["valid_from_lsn"], r["valid_from_snap"],
            r["valid_to_lsn"], r["valid_to_snap"], r["is_current"],
        )
        for r in df.collect()
    }


def _three_batch(spark, tmpdir_path):
    """a: insert → update → delete→reinsert; b: insert → delete;
    c: lone insert in batch 3."""
    s = _store(spark, tmpdir_path)
    s.merge(
        _folded(spark, [("a", 1, "PATCH", "user", "v1", None, 10),
                        ("b", 2, "PATCH", None, "w1", None, 11)]),
        batch_id=1,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", None, "v2", None, 20),
                        ("b", 2, "DELETE", None, None, None, 21)]),
        batch_id=2,
    )
    s.merge(
        _folded(spark, [("a", 1, "DELETE", None, None, None, 30),
                        ("c", 3, "PATCH", None, "x1", None, 31)]),
        batch_id=3,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", "user", "v3", None, 40)]),
        batch_id=4,
    )
    return s


def test_version_semantics(spark, tmpdir_path):
    s = _three_batch(spark, tmpdir_path)
    got = _rows(_hist(s))
    assert got == {
        # a: v1 closed by the update, v2 closed by the DELETE (which
        # opens nothing), v3 current after the re-insert
        ("a", 1, "v1", 10, 1, 20, 2, False),
        ("a", 1, "v2", 20, 2, 30, 3, False),
        ("a", 1, "v3", 40, 4, None, None, True),
        # b: one version, closed by its DELETE
        ("b", 2, "w1", 11, 1, 21, 2, False),
        # c: lone insert, still current
        ("c", 3, "x1", 31, 3, None, None, True),
    }


def test_intervals_disjoint_and_single_current(spark, tmpdir_path):
    s = _three_batch(spark, tmpdir_path)
    h = _hist(s)
    per_key: dict[tuple, list] = {}
    for r in h.collect():
        per_key.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    for vers in per_key.values():
        vers.sort(key=lambda r: r["valid_from_snap"])
        assert sum(1 for r in vers if r["is_current"]) <= 1
        for prev, nxt in zip(vers, vers[1:]):
            assert prev["valid_to_snap"] is not None
            assert prev["valid_to_snap"] <= nxt["valid_from_snap"]
            assert not prev["is_current"]


def test_current_equals_live_table(spark, tmpdir_path):
    s = _three_batch(spark, tmpdir_path)
    cur = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in _hist(s).where("is_current").collect()
    }
    live = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in s.read_table().collect()
    }
    assert cur == live


def test_as_of_equals_time_travel(spark, tmpdir_path):
    s = _three_batch(spark, tmpdir_path)
    h = _hist(s).cache()
    try:
        for snap in (1, 2, 3, 4):
            got = {
                (r["conv_id"], r["turn_idx"], r["text"])
                for r in scd2_as_of(h, snap).collect()
            }
            want = {
                (r["conv_id"], r["turn_idx"], r["text"])
                for r in s.read_table(as_of=snap).collect()
            }
            assert got == want, f"as_of {snap}"
    finally:
        h.unpersist()


def test_closed_version_count_is_update_plus_effective_delete(
    spark, tmpdir_path
):
    s = _three_batch(spark, tmpdir_path)
    feed = s.read_changes(0)
    n_upd = feed.where(F.col("change_type") == "UPDATE").count()
    n_del = feed.where(F.col("change_type") == "DELETE").count()
    closed = _hist(s).where(~F.col("is_current")).count()
    assert closed == n_upd + n_del


def test_plan_single_key_shuffle(spark, tmpdir_path):
    """The history is one key-hash window over the feed — no extra
    joins, no global sort."""
    s = _three_batch(spark, tmpdir_path)
    plan = _hist(s)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # window sort is within key partitions; no global Sort node
    assert "Exchange rangepartitioning" not in plan
