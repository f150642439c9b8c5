"""Cross-table consistent cut: correct snapshot selection at every
batch boundary, loud refusal on divergent watermarks or expired cuts.
"""

import os

import pyarrow.parquet as pq
import pytest

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.generator import _frames_table, encode_routed_changes
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.pipeline import (
    MultiTablePipeline, consistent_cut, read_consistent,
)
from pg_pb3_ld_spark.schema import (
    TargetColumn, TargetSchema, transcripts_schema,
)
from pg_pb3_ld_spark.sinks.store import SnapshotStore

CFG = EngineConfig(
    type_oids_mode="omit_nulls", formats_mode="disabled",
    binary_oid_ranges="20-23,1184",
)


def _changes(n=60):
    out = []
    for i in range(n):
        if i % 2 == 0:
            out.append((
                "public", "transcripts", "INSERT",
                [("conv_id", f"c{i % 7}", wire.OID_TEXT),
                 ("turn_idx", i % 3, wire.OID_INT4)],
                [("text", f"t{i}", wire.OID_TEXT)],
            ))
        else:
            out.append((
                "public", "doc_tags", "INSERT",
                [("doc_id", f"d{i % 5}", wire.OID_TEXT)],
                [("label", "x", wire.OID_TEXT),
                 ("score", i, wire.OID_INT4)],
            ))
    return out


def _doc_tags_schema():
    return TargetSchema(
        "doc_tags",
        [
            TargetColumn("doc_id", wire.OID_TEXT, "string", is_key=True),
            TargetColumn("label", wire.OID_TEXT, "string"),
            TargetColumn("score", wire.OID_INT4, "int"),
        ],
    )


def _setup(spark, root, frames):
    fpath = os.path.join(root, "frames.parquet")
    pq.write_table(_frames_table(frames), fpath)
    fdf = spark.read.parquet(fpath)
    stores = {
        "transcripts": SnapshotStore.create(
            spark, os.path.join(root, "tt"), transcripts_schema(),
            num_buckets=4,
        ),
        "doc_tags": SnapshotStore.create(
            spark, os.path.join(root, "dt"), _doc_tags_schema(),
            num_buckets=4,
        ),
    }
    return fdf, stores


def test_cut_exists_at_every_batch_boundary(spark, tmpdir_path):
    frames = encode_routed_changes(_changes(60), CFG, txn_every=10)
    assert len(frames) == 6
    fdf, stores = _setup(spark, tmpdir_path, frames)
    pipe = MultiTablePipeline(spark, stores, CFG)
    boundary_counts = {}
    for b, hi in enumerate((2, 4, 6), start=1):
        pipe.apply_frames(fdf.where(f"frame_seq < {hi}"), batch_id=b)
        for s in stores.values():
            s.refresh()
        lsn = frames[hi - 1][1]
        cut = consistent_cut(stores, lsn)
        assert (
            cut["transcripts"]["hwm_lsn"] == cut["doc_tags"]["hwm_lsn"]
        )
        views = read_consistent(stores, lsn)
        boundary_counts[b] = {
            t: df.count() for t, df in views.items()
        }
    # re-reading EARLIER cuts after later batches returns the same
    # historical states (time travel through the cut API)
    for b, hi in enumerate((2, 4, 6), start=1):
        views = read_consistent(stores, frames[hi - 1][1])
        assert {t: df.count() for t, df in views.items()} == \
            boundary_counts[b]
    # monotone growth sanity: keys accumulate (inserts only)
    assert boundary_counts[1]["transcripts"] <= \
        boundary_counts[3]["transcripts"]


def test_divergent_watermarks_raise(spark, tmpdir_path):
    frames = encode_routed_changes(_changes(60), CFG, txn_every=10)
    fdf, stores = _setup(spark, tmpdir_path, frames)
    # batch 1 reaches ONLY transcripts (doc_tags bootstrapped "late")
    solo = MultiTablePipeline(
        spark, {"transcripts": stores["transcripts"]}, CFG
    )
    solo.apply_frames(fdf.where("frame_seq < 2"), batch_id=1)
    both = MultiTablePipeline(spark, stores, CFG)
    both.apply_frames(fdf.where("frame_seq < 4"), batch_id=2)
    for s in stores.values():
        s.refresh()
    # at the batch-2 boundary both stores agree
    assert consistent_cut(stores, frames[3][1])
    # at the batch-1 boundary doc_tags has no matching snapshot state
    with pytest.raises(ValueError, match="diverge"):
        consistent_cut(stores, frames[1][1])


def test_cut_before_table_existed_raises(spark, tmpdir_path):
    frames = encode_routed_changes(_changes(60), CFG, txn_every=10)
    fdf, stores = _setup(spark, tmpdir_path, frames)
    pipe = MultiTablePipeline(spark, stores, CFG)
    pipe.apply_frames(fdf, batch_id=1)
    for s in stores.values():
        s.refresh()
    # lsn below every snapshot incl. the empty bootstrap (-1)
    with pytest.raises(ValueError, match="no readable snapshot"):
        consistent_cut(stores, -2)


def test_expired_cut_raises(spark, tmpdir_path):
    frames = encode_routed_changes(_changes(60), CFG, txn_every=10)
    fdf, stores = _setup(spark, tmpdir_path, frames)
    pipe = MultiTablePipeline(spark, stores, CFG)
    for b, hi in enumerate((2, 4, 6), start=1):
        pipe.apply_frames(fdf.where(f"frame_seq < {hi}"), batch_id=b)
    for s in stores.values():
        s.refresh()
        s.expire_snapshots(keep_last=1)
        s.refresh()
    with pytest.raises(ValueError):
        consistent_cut(stores, frames[1][1])
    # the current boundary still cuts fine
    assert consistent_cut(stores, frames[5][1])
