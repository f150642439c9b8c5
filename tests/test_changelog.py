"""Change data feed (CDF) — the downstream-consumption face of the
CDC sink (Delta CDF / Iceberg changelog parity).

``SnapshotStore.create(changelog=True)`` makes every COW merge write
its resolved (key, change_type, post-image) rows alongside the
snapshot; MoR delta commits serve their own delta log as the feed;
``read_changes(since, until)`` reads any snapshot range.  The
semantic anchor: **replaying the COW feed in snapshot order onto the
pre-range state reproduces the post-range table exactly** — that is
what makes the feed consumable by a downstream materializer.
"""

from __future__ import annotations

import os

import pytest

from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

from tests.test_mor import _folded


def _store(spark, tmpdir_path, name="s", **kw):
    return SnapshotStore.create(
        spark, os.path.join(tmpdir_path, name), transcripts_schema(),
        num_buckets=2, changelog=True, **kw,
    )


def _feed(store, since=0, until=None):
    return [
        (
            r["conv_id"], r["turn_idx"], r["change_type"], r["role"],
            r["text"], int(r["snapshot_id"]),
        )
        for r in store.read_changes(since, until)
        .orderBy("snapshot_id", "conv_id", "turn_idx")
        .collect()
    ]


def test_cow_feed_classification(spark, tmpdir_path):
    s = _store(spark, tmpdir_path)
    s.merge(
        _folded(spark, [("a", 1, "PATCH", "user", "v1", None, 1),
                        ("b", 2, "REPLACE", None, "w1", None, 2),
                        # DELETE with no target row → no feed row
                        ("z", 9, "DELETE", None, None, None, 3)]),
        batch_id=1,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", None, "v2", None, 4),
                        ("b", 2, "DELETE", None, None, None, 5),
                        ("c", 3, "PATCH", None, "new", None, 6)]),
        batch_id=2,
    )
    assert _feed(s) == [
        ("a", 1, "INSERT", "user", "v1", 1),
        ("b", 2, "INSERT", None, "w1", 1),
        # batch 2: a updates (post-image keeps the unpatched role),
        # b deletes (post-image nulls), c inserts
        ("a", 1, "UPDATE", "user", "v2", 2),
        ("b", 2, "DELETE", None, None, 2),
        ("c", 3, "INSERT", None, "new", 2),
    ]
    # range reads slice by snapshot
    assert {t[5] for t in _feed(s, since=1)} == {2}
    assert {t[5] for t in _feed(s, until=1)} == {1}


def test_feed_disabled_raises(spark, tmpdir_path):
    s = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "off"), transcripts_schema(),
        num_buckets=2,
    )
    with pytest.raises(RuntimeError, match="changelog=True"):
        s.read_changes()


def test_mor_feed_is_the_delta_log(spark, tmpdir_path):
    s = _store(spark, tmpdir_path)
    s.merge_mor(
        _folded(spark, [("a", 1, "PATCH", None, "v1", None, 1)]),
        batch_id=1,
    )
    s.merge_mor(
        _folded(spark, [("a", 1, "DELETE", None, None, None, 2),
                        ("b", 2, "PATCH", "u", None, None, 3)]),
        batch_id=2,
    )
    assert _feed(s) == [
        ("a", 1, "UPSERT", None, "v1", 1),
        ("a", 2 - 1, "DELETE", None, None, 2),
        ("b", 2, "UPSERT", "u", None, 2),
    ]
    # compaction moves bytes, not state: feed unchanged afterward
    before = _feed(s)
    s.compact()
    assert _feed(s, until=2) == before
    # the compaction snapshot itself emits nothing
    assert _feed(s, since=2) == []


def test_cow_feed_replay_reproduces_table(spark, tmpdir_path):
    """Materializer semantics: applying the feed rows of (since, hi]
    in snapshot order onto the as_of=since state reproduces the
    as_of=hi table — byte-for-byte, including column-level PATCH
    effects (post-images are full rows, so replay is a plain upsert/
    delete per row)."""
    import random

    s = _store(spark, tmpdir_path)
    rng = random.Random(31)
    lsn = 0
    for b in range(4):
        rows = []
        for key in rng.sample(range(24), rng.randint(6, 18)):
            conv, turn = f"c{key % 8}", key // 8
            kind = rng.choice(["PATCH", "PATCH", "REPLACE", "DELETE"])
            lsn += 1
            role = f"r{lsn}" if rng.random() < 0.5 else None
            txt = f"t{lsn}" if rng.random() < 0.7 else None
            rows.append(
                (conv, turn, kind, role, txt, None, lsn)
                if kind != "DELETE"
                else (conv, turn, kind, None, None, None, lsn)
            )
        s.merge(_folded(spark, rows), batch_id=b)

    since = 2
    base = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in s.read_table(as_of=since).collect()
    }
    state = dict(base)
    for r in (
        s.read_changes(since)
        .orderBy("snapshot_id", "last_lsn")
        .collect()
    ):
        key = (r["conv_id"], r["turn_idx"])
        if r["change_type"] == "DELETE":
            state.pop(key, None)
        else:
            state[key] = (r["role"], r["text"], r["tool"])
    want = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in s.read_table().collect()
    }
    assert state == want


def test_feed_expired_range_raises(spark, tmpdir_path):
    s = _store(spark, tmpdir_path)
    for i in range(3):
        s.merge(
            _folded(spark, [("a", 1, "PATCH", None, f"v{i}", None, i + 1)]),
            batch_id=i,
        )
    s.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        s.read_changes(0).collect()
    # the retained range still reads
    assert len(_feed(s, since=s.snapshot_id - 1)) == 1
