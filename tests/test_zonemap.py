"""Zone-map data skipping (`sinks/store.py`): pruned reads equal
full-scan-filtered reads on every commit path, stale maps are
invalidated by MoR deltas and rebuilt by compaction, and pruning
actually skips buckets."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

from tests.test_mor import _folded


def _store(spark, tmpdir_path, name="z", **kw):
    return SnapshotStore.create(
        spark, os.path.join(tmpdir_path, name), transcripts_schema(),
        num_buckets=8, zonemap_cols=["text"], **kw,
    )


def _rows(n, lo=0):
    # text values 't000'..: zone maps on text give a clean string range
    return [
        (f"c{i % 24}", i % 3, "PATCH", None, f"t{lo + i:04d}", None,
         lo + i + 1)
        for i in range(n)
    ]


def _as_set(df):
    return {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }


def test_pruned_read_equals_filtered_full_scan(spark, tmpdir_path):
    s = _store(spark, tmpdir_path)
    s.merge(_folded(spark, _rows(60)), batch_id=1)
    lo, hi = "t0010", "t0030"
    got = _as_set(s.read_range("text", lo, hi))
    want = _as_set(
        s.read_table().where(
            (F.col("text") >= lo) & (F.col("text") <= hi)
        )
    )
    assert got == want and got
    # an out-of-range read prunes EVERY bucket and returns nothing
    assert s.prune_buckets("text", "zzz", None) == []
    assert s.read_range("text", "zzz").count() == 0


def test_unmapped_column_never_prunes(spark, tmpdir_path):
    s = _store(spark, tmpdir_path, name="u")
    s.merge(_folded(spark, _rows(30)), batch_id=1)
    # role has no zone map -> every bucket retained, read still right
    assert len(s.prune_buckets("role", "x", "y")) == len(
        s._meta["files"]
    )


def test_validation_rejects_bad_cols(spark, tmpdir_path):
    with pytest.raises(KeyError):
        SnapshotStore.create(
            spark, os.path.join(tmpdir_path, "bad1"),
            transcripts_schema(), zonemap_cols=["nope"],
        )
    with pytest.raises(ValueError, match="not supported"):
        SnapshotStore.create(
            spark, os.path.join(tmpdir_path, "bad2"),
            transcripts_schema(), zonemap_cols=["ts"],
        )


def test_mor_delta_invalidates_then_compact_rebuilds(
    spark, tmpdir_path
):
    s = _store(spark, tmpdir_path, name="m")
    s.merge(_folded(spark, _rows(40)), batch_id=1)
    n_mapped = len(s._meta.get("zonemap", {}))
    assert n_mapped > 0
    # delta commit: touched buckets lose their entries (stats lie)
    s.merge_mor(
        _folded(spark, [("c0", 0, "PATCH", None, "zzzz", None, 900)]),
        batch_id=2,
    )
    assert len(s._meta.get("zonemap", {})) < n_mapped
    # the out-of-old-range row is still FOUND (unprunable bucket)
    assert ("c0", 0, "zzzz") in _as_set(
        s.read_range("text", "zzzz", None)
    )
    # compaction rebuilds base files and the zone map with them
    s.compact()
    assert len(s._meta.get("zonemap", {})) == n_mapped
    assert ("c0", 0, "zzzz") in _as_set(
        s.read_range("text", "zzzz", None)
    )


def test_pruning_skips_buckets_and_survives_time_travel(
    spark, tmpdir_path
):
    s = _store(spark, tmpdir_path, name="tt")
    # batch 1: low range; batch 2: disjoint high range — different
    # buckets get different spans
    s.merge(_folded(spark, _rows(40)), batch_id=1)
    s.merge(_folded(spark, _rows(40, lo=5000)), batch_id=2)
    pruned = s.prune_buckets("text", "t5000", None)
    assert 0 < len(pruned) <= len(s._meta["files"])
    got = _as_set(s.read_range("text", "t5000", None))
    want = _as_set(
        s.read_table().where(F.col("text") >= "t5000")
    )
    assert got == want and len(got) == 40
    # as_of=1 sees only the old span (zone map is versioned with the
    # snapshot): the high range reads empty
    assert s.read_range("text", "t5000", None, as_of=1).count() == 0
