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


def test_cow_feed_preimages(spark, tmpdir_path):
    """preimages=True adds _pre_<col>: the target row's values before
    the commit — NULL for INSERT, populated for UPDATE/DELETE (the
    Delta-CDF update_preimage face, as columns)."""
    s = _store(spark, tmpdir_path, name="pre")
    s.merge(
        _folded(spark, [("a", 1, "PATCH", "user", "v1", None, 1),
                        ("b", 2, "PATCH", None, "w1", None, 2)]),
        batch_id=1,
    )
    s.merge(
        _folded(spark, [("a", 1, "PATCH", None, "v2", None, 3),
                        ("b", 2, "DELETE", None, None, None, 4),
                        ("c", 3, "PATCH", None, "new", None, 5)]),
        batch_id=2,
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["change_type"], r["text"], r["_pre_text"], r["_pre_role"]
        )
        for r in s.read_changes(1, preimages=True).collect()
    }
    assert got == {
        ("a", 1): ("UPDATE", "v2", "v1", "user"),
        ("b", 2): ("DELETE", None, "w1", None),
        ("c", 3): ("INSERT", "new", None, None),
    }
    # batch-1 inserts: every pre-image is NULL
    for r in s.read_changes(0, until=1, preimages=True).collect():
        assert r["_pre_text"] is None and r["_pre_role"] is None
    # MoR commits never read the target: pre columns NULL, disclosed
    s.merge_mor(
        _folded(spark, [("a", 1, "PATCH", None, "v3", None, 6)]),
        batch_id=3,
    )
    (r,) = s.read_changes(2, preimages=True).collect()
    assert r["change_type"] == "UPSERT" and r["_pre_text"] is None


def test_feed_incremental_view_maintenance(spark, tmpdir_path):
    """A downstream aggregate maintained ONLY from the feed (base agg
    at the since-snapshot + per-commit retract-pre/apply-post deltas)
    equals the direct recompute over the final table — the property
    pre-images exist to provide."""
    import random

    from pyspark.sql import functions as F

    s = _store(spark, tmpdir_path, name="ivm")
    rng = random.Random(77)
    lsn = 0
    for b in range(4):
        rows = []
        for key in rng.sample(range(24), rng.randint(8, 20)):
            conv, turn = f"c{key % 6}", key // 6
            kind = rng.choice(["PATCH", "PATCH", "REPLACE", "DELETE"])
            lsn += 1
            txt = f"txt{lsn}" * rng.randint(1, 3)
            rows.append(
                (conv, turn, kind, None, txt, None, lsn)
                if kind != "DELETE"
                else (conv, turn, kind, None, None, None, lsn)
            )
        s.merge(_folded(spark, rows), batch_id=b)

    since = 1
    base = (
        s.read_table(as_of=since)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("chars"),
        )
    )
    ch = s.read_changes(since, preimages=True)
    ln = lambda c: F.coalesce(F.length(c), F.lit(0))  # noqa: E731
    deltas = ch.groupBy("conv_id").agg(
        F.sum(
            F.when(F.col("change_type") == "INSERT", 1)
            .when(F.col("change_type") == "DELETE", -1)
            .otherwise(0)
        ).alias("dn"),
        F.sum(
            F.when(F.col("change_type") == "INSERT", ln("text"))
            .when(F.col("change_type") == "DELETE", -ln("_pre_text"))
            .otherwise(ln("text") - ln("_pre_text"))
        ).alias("dchars"),
    )
    maintained = {
        (r["conv_id"]): (int(r["n2"]), int(r["c2"]))
        for r in base.join(deltas, "conv_id", "full_outer")
        .select(
            "conv_id",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n2"),
            (F.coalesce("chars", F.lit(0)) + F.coalesce("dchars", F.lit(0))).alias("c2"),
        )
        .where(F.col("n2") > 0)
        .collect()
    }
    direct = {
        r["conv_id"]: (int(r["n"]), int(r["c"]))
        for r in s.read_table()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("c"),
        )
        .collect()
    }
    assert maintained == direct


def test_diff_snapshots_equals_netted_feed(spark, tmpdir_path):
    """diff_snapshots (endpoint re-diff) ≡ the feed netted per key:
    first feed row in the range tells presence at `since`, last tells
    the end state; change-and-change-back keys net to nothing.  Either
    path must yield the same downstream state transition."""
    import random

    s = _store(spark, tmpdir_path, name="diff")
    rng = random.Random(55)
    lsn = 0
    for b in range(5):
        rows = []
        for key in rng.sample(range(18), rng.randint(5, 14)):
            conv, turn = f"c{key % 6}", key // 6
            kind = rng.choice(["PATCH", "PATCH", "REPLACE", "DELETE"])
            lsn += 1
            # small value space to exercise change-and-change-back
            txt = f"t{lsn % 3}"
            role = f"r{lsn % 2}" if rng.random() < 0.6 else None
            rows.append(
                (conv, turn, kind, role, txt, None, lsn)
                if kind != "DELETE"
                else (conv, turn, kind, None, None, None, lsn)
            )
        s.merge(_folded(spark, rows), batch_id=b)

    since, until = 2, 5
    diff = {
        (r["conv_id"], r["turn_idx"]): (
            r["change_type"],
            (r["role"], r["text"], r["tool"]),
            (r["_pre_role"], r["_pre_text"], r["_pre_tool"]),
        )
        for r in s.diff_snapshots(since, until).collect()
    }

    feed_rows = {}
    for r in (
        s.read_changes(since, until, preimages=True)
        .orderBy("snapshot_id", "last_lsn")
        .collect()
    ):
        feed_rows.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    netted = {}
    for key, rs in feed_rows.items():
        present_before = rs[0]["change_type"] != "INSERT"
        pre = (rs[0]["_pre_role"], rs[0]["_pre_text"], rs[0]["_pre_tool"])
        last = rs[-1]
        alive_after = last["change_type"] != "DELETE"
        post = (last["role"], last["text"], last["tool"])
        if not present_before and alive_after:
            netted[key] = ("INSERT", post, (None, None, None))
        elif present_before and not alive_after:
            netted[key] = ("DELETE", (None, None, None), pre)
        elif present_before and alive_after and post != pre:
            netted[key] = ("UPDATE", post, pre)
        # absent→dead or value-unchanged: no net change
    assert diff == netted


def test_streaming_cdf_end_to_end(spark, tmpdir_path):
    """The change feed composes with the streaming runner for free
    (changelog is a store property, not a pipeline mode): a streamed
    multi-micro-batch ingest leaves one feed slice per committing
    batch, and replaying the WHOLE feed from empty reproduces the
    final table — the downstream materializer driven by a real
    Structured Streaming run."""
    from pg_pb3_ld_spark.config import EngineConfig
    from pg_pb3_ld_spark.generator import (
        generate_stream,
        write_frames_parquet_dir,
    )
    from pg_pb3_ld_spark.streaming.runner import run_stream

    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    stream = generate_stream(seed=23, n_convs=12, max_turns=6,
                             n_extra_txns=30)
    frames_dir = os.path.join(tmpdir_path, "landing")
    write_frames_parquet_dir(stream, frames_dir, n_files=6)
    store = SnapshotStore.create(
        spark, os.path.join(tmpdir_path, "t"), transcripts_schema(),
        num_buckets=4, changelog=True,
    )
    metrics = run_stream(
        spark, frames_dir, store, cfg,
        checkpoint_dir=os.path.join(tmpdir_path, "ck"),
        max_files_per_trigger=2,
    )
    committing = [m for m in metrics if not m.get("skipped")]
    assert len(committing) >= 2
    feed = (
        store.read_changes(0)
        .orderBy("snapshot_id", "last_lsn")
        .collect()
    )
    # one snapshot id per committing micro-batch, in commit order
    assert sorted({int(r["snapshot_id"]) for r in feed}) == list(
        range(1, store.snapshot_id + 1)
    )
    # materialize from empty: replay = final table
    state = {}
    for r in feed:
        key = (r["conv_id"], r["turn_idx"])
        if r["change_type"] == "DELETE":
            state.pop(key, None)
        else:
            state[key] = (r["role"], r["text"], r["tool"])
    want = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in store.read_table().collect()
    }
    assert state == want
