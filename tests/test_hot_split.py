"""Hot-bucket sub-splitting (COW write-amplification guard).

The storm stream shows bucket-key skew of ~6.5× the median
(BENCH detail.skew) and the COW store rewrites whole buckets, so at
10^10 events one hot bucket serializes the write path behind a single
task.  With ``hot_split_rows`` set, a bucket whose merged row count
exceeds the threshold is written as ``_bucket=K/_sub=J`` leaf dirs —
J a hash of the FULL key, so one hot conv_id's turns spread — and
reads union the subs transparently.  These tests pin:

1. split ≡ unsplit table content (differential over multiple merges,
   including updates and deletes landing in split buckets);
2. the leaf spread actually shrinks (max leaf rows bounded);
3. lineage carries rows + n_sub and the NEXT merge's projection uses
   the recorded rows;
4. emptying a split bucket removes it from the files map.
"""

from __future__ import annotations

import os

from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import SnapshotStore

_FOLD_DDL = (
    "conv_id string, turn_idx int, kind string, "
    "role string, role_set boolean, text string, text_set boolean, "
    "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
    "last_lsn long, last_frame_seq long, n_changes long"
)


def _folded(spark, rows):
    """rows: (conv_id, turn_idx, kind, text, lsn)"""
    return spark.createDataFrame(
        [
            (c, t, k, None, False, txt, txt is not None, None, False,
             None, False, lsn, lsn, 1)
            for c, t, k, txt, lsn in rows
        ],
        _FOLD_DDL,
    )


def _hot_batch(lsn0, n_turns=300, kind="REPLACE"):
    # ONE conv_id with many turns — the exact storm shape a conv_id
    # sub-hash could NOT split
    return [
        ("conv-hot", t, kind, f"txt-{lsn0}-{t}", lsn0 + t)
        for t in range(n_turns)
    ] + [(f"conv-{i}", 0, kind, f"cold-{lsn0}-{i}", lsn0 + 1000 + i)
         for i in range(20)]


def _table(store):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in store.read_table().collect()
    }


def test_split_differential_and_leaf_spread(spark, tmpdir_path):
    roots = {
        "split": os.path.join(tmpdir_path, "split"),
        "plain": os.path.join(tmpdir_path, "plain"),
    }
    stores = {
        name: SnapshotStore.create(
            spark, root, transcripts_schema(), num_buckets=4,
            hot_split_rows=(80 if name == "split" else 0),
        )
        for name, root in roots.items()
    }
    # merge 1: hot conv + cold convs
    for s in stores.values():
        s.merge(_folded(spark, _hot_batch(0)), batch_id=1)
    # merge 2: PATCH updates into the split bucket + some deletes
    upd = [("conv-hot", t, "PATCH", f"upd-{t}", 5000 + t)
           for t in range(0, 300, 3)]
    dels = [("conv-hot", t, "DELETE", None, 6000 + t)
            for t in range(1, 300, 50)]
    for s in stores.values():
        s.merge(_folded(spark, upd + dels), batch_id=2)

    t_split, t_plain = _table(stores["split"]), _table(stores["plain"])
    assert t_split == t_plain
    assert ("conv-hot", 0) in t_split and t_split[("conv-hot", 0)] == "upd-0"
    assert ("conv-hot", 1) not in t_split  # deleted

    # the hot bucket was actually split, and its leaves are bounded
    leaves = stores["split"].leaf_file_rows()
    totals: dict[str, int] = {}
    for k, v in leaves.items():
        totals[k.split("/")[0]] = totals.get(k.split("/")[0], 0) + v
    hot_bucket = max(totals, key=totals.get)
    split_leaves = {
        k: v for k, v in leaves.items()
        if "/" in k and k.split("/")[0] == hot_bucket
    }
    assert len(split_leaves) > 1, leaves
    bucket_total = totals[hot_bucket]
    assert max(split_leaves.values()) < bucket_total
    # vs the unsplit store: one monolithic leaf carries everything
    plain_leaves = stores["plain"].leaf_file_rows()
    assert all("/" not in k for k in plain_leaves)
    assert max(split_leaves.values()) < max(plain_leaves.values())

    # lineage records rows + n_sub, and rows matches the real count
    lin = stores["split"].lineage()[hot_bucket]
    assert lin["n_sub"] > 1
    assert lin["rows"] == bucket_total


def test_projection_uses_recorded_rows(spark, tmpdir_path):
    """A bucket grown hot by ACCUMULATION must split even when each
    individual batch is small: the projection is lineage rows + batch
    keys, not batch keys alone."""
    root = os.path.join(tmpdir_path, "acc")
    s = SnapshotStore.create(
        spark, root, transcripts_schema(), num_buckets=1,
        hot_split_rows=100,
    )
    # 60-row batches: none exceeds 100 alone; cumulative does
    s.merge(_folded(
        spark, [("c", t, "REPLACE", f"a{t}", t) for t in range(60)]
    ), batch_id=1)
    assert "n_sub" not in s.lineage()["0"]
    s.merge(_folded(
        spark, [("c", 60 + t, "REPLACE", f"b{t}", 100 + t)
                for t in range(60)]
    ), batch_id=2)
    lin = s.lineage()["0"]
    assert lin["rows"] == 120 and lin["n_sub"] == 2
    assert len(_table(s)) == 120


def test_emptying_split_bucket_removes_files_entry(spark, tmpdir_path):
    root = os.path.join(tmpdir_path, "empty")
    s = SnapshotStore.create(
        spark, root, transcripts_schema(), num_buckets=1,
        hot_split_rows=10,
    )
    rows = [("c", t, "REPLACE", f"x{t}", t) for t in range(40)]
    s.merge(_folded(spark, rows), batch_id=1)
    assert any("/" in k for k in s.leaf_file_rows())
    s.merge(
        _folded(spark, [("c", t, "DELETE", None, 100 + t)
                        for t in range(40)]),
        batch_id=2,
    )
    assert s._meta["files"] == {}
    assert _table(s) == {}
