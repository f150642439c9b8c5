"""Round-4 regression tests for the judge/advisor findings:

1. connected_components' fixpoint test must survive int64 labels near
   2^62 (the old ``sum(label)`` bigint agg throws under Spark 4's
   default ANSI mode once the total passes 2^63, and with ANSI off a
   wrap collision could silently declare a false fixpoint).
2. connected_components over an EMPTY graph converges immediately
   (the null-sum rounds used to exhaust max_iters and raise).
3. Snapshot-store rename collision: a FRESH colliding snapshot dir may
   belong to a concurrent writer between its rename and its pointer
   swap — it must raise CommitConflictError, never be rmtree'd
   (silent loss of the other writer's merge); only dirs older than the
   commit lease are reclaimed as crash orphans.
4. resize_media / sample_audio_frames with a null media id: the error
   row itself must not throw (int(NaN) in the except block used to
   kill the whole Arrow batch).
5. JPEG segment walk: 0xFF fill bytes and length-less markers (TEM,
   stray RSTn) in the header section, and streams that end without
   EOI, all decode byte-identically to the clean stream.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import dedup
from pg_pb3_ld_spark.schema import transcripts_schema
from pg_pb3_ld_spark.sinks.store import CommitConflictError, SnapshotStore

_FOLD_DDL = (
    "conv_id string, turn_idx int, kind string, "
    "role string, role_set boolean, text string, text_set boolean, "
    "tool string, tool_set boolean, ts timestamp, ts_set boolean, "
    "last_lsn long, last_frame_seq long, n_changes long"
)


def _folded(spark, rows):
    return spark.createDataFrame(
        [
            (c, t, k, None, False, txt, txt is not None, None, False,
             None, False, lsn, lsn, 1)
            for c, t, k, txt, lsn in rows
        ],
        _FOLD_DDL,
    )


# ------------------------------------------------------- CC fixpoint


def test_cc_fixpoint_survives_huge_labels(spark):
    """Labels near 2^62: three of them sum past int64 — the old bigint
    sum(label) fixpoint test THREW under ANSI mode.  Must neither
    throw nor mis-cluster."""
    base = 1 << 62
    ids = [base, base + 1, base + 2, base + 3]
    nodes = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    edges = spark.createDataFrame(
        [(base, base + 1), (base + 2, base + 3)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert got == {
        base: base, base + 1: base,
        base + 2: base + 2, base + 3: base + 2,
    }


def test_cc_empty_graph_converges(spark):
    """Zero nodes is trivially converged — must not raise
    'did not converge' after exhausting max_iters."""
    nodes = spark.createDataFrame([], "doc_id long")
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    out = dedup.connected_components(edges, nodes, max_iters=5)
    assert out.count() == 0


def test_cc_wrap_collision_not_false_fixpoint(spark):
    """A label change whose bigint-wrapped sum would collide with the
    previous round's must still be detected (decimal sums don't
    wrap).  Constructed so labels keep changing for several rounds."""
    # chain 10-20-30-40: min-label propagation needs >2 rounds
    nodes = spark.createDataFrame(
        [(i,) for i in (10, 20, 30, 40)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 40: 10}


# ------------------------------------------- store commit concurrency


def test_inflight_writer_snapshot_not_destroyed(spark, tmpdir_path):
    """Writer A has renamed its snapshot into place but not yet
    swapped the pointer; writer B's colliding commit must conflict —
    NOT rmtree A's fully-written snapshot (which would silently lose
    A's merge while both writers believe they committed)."""
    root = os.path.join(tmpdir_path, "t")
    a = SnapshotStore.create(spark, root, transcripts_schema(), num_buckets=2)
    b = SnapshotStore(spark, root)  # same base snapshot

    # A commits, but "crashes"/stalls between rename and pointer swap
    orig_swap = type(a)._swap_pointer
    try:
        type(a)._swap_pointer = staticmethod(lambda root, sid: None)
        a.merge(_folded(spark, [("c0", 0, "PATCH", "from-a", 100)]),
                batch_id=1, hwm_override=(100, 0))
    finally:
        type(a)._swap_pointer = staticmethod(orig_swap)
    a_dir = os.path.join(root, "snapshots", "000001")
    assert os.path.exists(os.path.join(a_dir, "meta.json"))

    # B collides on snapshot id 1 while A is "in flight" (dir fresh)
    with pytest.raises(CommitConflictError, match="in-flight"):
        b.merge(_folded(spark, [("c1", 0, "PATCH", "from-b", 200)]),
                batch_id=2, hwm_override=(200, 1))
    # A's snapshot survived intact
    assert os.path.exists(os.path.join(a_dir, "meta.json"))

    # A finishes its pointer swap; B refreshes and retries cleanly
    SnapshotStore._swap_pointer(root, 1)
    b.refresh()
    b.merge(_folded(spark, [("c1", 0, "PATCH", "from-b", 200)]),
            batch_id=2, hwm_override=(200, 1))
    final = SnapshotStore(spark, root)
    rows = {r["conv_id"]: r["text"] for r in final.read_table().collect()}
    assert rows == {"c0": "from-a", "c1": "from-b"}


def test_stale_orphan_is_reclaimed(spark, tmpdir_path):
    """A colliding dir older than the commit lease is a crash orphan
    (pointer never swapped, no writer alive) — reclaimed so replay
    converges without manual cleanup."""
    root = os.path.join(tmpdir_path, "t")
    a = SnapshotStore.create(spark, root, transcripts_schema(), num_buckets=2)

    orig_swap = type(a)._swap_pointer
    try:
        type(a)._swap_pointer = staticmethod(lambda root, sid: None)
        a.merge(_folded(spark, [("c0", 0, "PATCH", "crashed", 100)]),
                batch_id=1, hwm_override=(100, 0))
    finally:
        type(a)._swap_pointer = staticmethod(orig_swap)
    orphan = os.path.join(root, "snapshots", "000001")
    old = os.stat(orphan).st_mtime - SnapshotStore.ORPHAN_LEASE_SEC - 5
    os.utime(orphan, (old, old))

    b = SnapshotStore(spark, root)  # opens at snapshot 0
    b.merge(_folded(spark, [("c0", 0, "PATCH", "replayed", 100)]),
            batch_id=1, hwm_override=(100, 0))
    assert b.snapshot_id == 1
    rows = {r["conv_id"]: r["text"] for r in b.read_table().collect()}
    assert rows == {"c0": "replayed"}


# --------------------------------------------------- media error rows


def test_resize_media_null_id_does_not_kill_batch(spark):
    from pg_pb3_ld_spark.functions.multimodal import resize_media

    df = spark.createDataFrame(
        [(None, None), (7, None)], "media_id long, blob binary"
    )
    rows = {r["media_id"]: r["error"]
            for r in resize_media(df, 4, 4).collect()}
    assert set(rows) == {-1, 7}
    assert all(e is not None for e in rows.values())


def test_audio_sample_null_id_does_not_kill_batch(spark):
    from pg_pb3_ld_spark.functions.multimodal import sample_audio_frames

    df = spark.createDataFrame(
        [(None, None), (9, None)], "media_id long, blob binary"
    )
    rows = {r["media_id"]: r["error"]
            for r in sample_audio_frames(df).collect()}
    assert set(rows) == {-1, 9}
    assert all(e is not None for e in rows.values())


# ------------------------------------------- bounded txn-id collect


def test_adaptive_shift_bounds_driver_rows():
    from pg_pb3_ld_spark.operators.txn import (
        MAX_DRIVER_CHUNKS, _adaptive_shift,
    )

    # 10^6 frames at the default shift 8 would be ~3906 chunks (fits);
    # 10^10 frames would be 39M — the adaptive shift must clamp it
    for n_frames in (10**6, 10**8, 10**10, 10**13):
        shift = _adaptive_shift(0, n_frames - 1, 8)
        n_chunks = ((n_frames - 1) >> shift) + 1
        assert n_chunks <= MAX_DRIVER_CHUNKS, (n_frames, shift, n_chunks)
        assert shift >= 8
    # sparse high range: what matters is the SPAN, not the magnitude
    shift = _adaptive_shift(10**12, 10**12 + 1000, 8)
    assert shift == 8


def test_assign_txn_ids_equivalent_under_forced_adaptation(spark):
    """A stream whose frame range forces the shift up must produce the
    same txn ids as the plain small-range stream (ids depend only on
    BEGIN order, never on chunk geometry)."""
    from pg_pb3_ld_spark.operators import txn as txn_ops

    rows = []
    fs = 0
    for t in range(20):
        rows.append((fs, 0, "BEGIN"))
        rows.append((fs, 1, "INSERT"))
        rows.append((fs + 1, 0, "INSERT"))
        rows.append((fs + 1, 1, "COMMIT"))
        fs += 2
    df = spark.createDataFrame(rows, "frame_seq long, offset_idx int, op string")
    want = {
        (r["frame_seq"], r["offset_idx"]): r["txn_id"]
        for r in txn_ops.assign_txn_ids(df).collect()
    }
    # spread the same stream over a 10^9-frame range: with cap 4096 the
    # shift must rise (range>>8 ≈ 4M chunks), ids must not change
    spread = df.withColumn(
        "frame_seq", F.col("frame_seq") * (10**9 // 40)
    )
    got = {
        (r["frame_seq"], r["offset_idx"]): r["txn_id"]
        for r in txn_ops.assign_txn_ids(spread).collect()
    }
    scale = 10**9 // 40
    assert got == {(f * scale, o): t for (f, o), t in want.items()}
    assert sorted(set(got.values())) == list(range(1, 21))


# --------------------------------------------------- JPEG walk repair


def _gray_fixture():
    from tests.test_jpeg_real import encode_jpeg_gray

    yy, xx = np.mgrid[0:16, 0:16]
    px = ((yy * 5 + xx * 3) % 190 + 30).astype(np.float64)
    blob, _, _ = encode_jpeg_gray(px)
    return blob


def _gray_fixture_import():
    # tests may not be a package in this repo — fall back to a direct
    # path import of the sibling module
    try:
        return _gray_fixture()
    except ImportError:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "jpeg_real", os.path.join(os.path.dirname(__file__),
                                      "test_jpeg_real.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yy, xx = np.mgrid[0:16, 0:16]
        px = ((yy * 5 + xx * 3) % 190 + 30).astype(np.float64)
        blob, _, _ = mod.encode_jpeg_gray(px)
        return blob


def test_jpeg_fill_bytes_and_tem_markers(spark_noop=None):
    from pg_pb3_ld_spark.functions.jpeg import decode_jpeg_pixels

    blob = _gray_fixture_import()
    want = decode_jpeg_pixels(blob)
    # T.81 allows any number of 0xFF fill bytes before a marker
    filled = blob[:2] + b"\xff\xff" + blob[2:]
    np.testing.assert_array_equal(decode_jpeg_pixels(filled), want)
    # TEM (0xFF01) and stray RSTn are standalone — no length field
    tem = blob[:2] + b"\xff\x01" + blob[2:]
    np.testing.assert_array_equal(decode_jpeg_pixels(tem), want)
    rst = blob[:2] + b"\xff\xd3" + blob[2:]
    np.testing.assert_array_equal(decode_jpeg_pixels(rst), want)


def test_native_codec_hatch_default_off_and_stub_on(monkeypatch):
    """The PB3LD_NATIVE_CODECS escape hatch: off by default (pure
    decoders stay deterministic), engages through a stub PIL module
    (Pillow itself is absent in this sandbox — the plumbing is what's
    under test), and falls back cleanly when PIL is unimportable."""
    import sys
    import types

    from pg_pb3_ld_spark.functions import multimodal as mm

    png = mm.encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    pure = mm.decode_image_pixels(png)

    # default: env unset → pure path even if a (stub) PIL existed
    monkeypatch.delenv("PB3LD_NATIVE_CODECS", raising=False)
    assert mm._native_decode(png) is None

    # env set but PIL genuinely unimportable → fall through to pure
    monkeypatch.setenv("PB3LD_NATIVE_CODECS", "1")
    sys.modules.pop("PIL", None)
    assert mm._native_decode(png) is None
    np.testing.assert_array_equal(mm.decode_image_pixels(png), pure)

    # env set + stub PIL → the native result is returned verbatim
    marker = np.full((2, 2), 7, dtype=np.uint8)

    class _StubIm:
        format = None
        mode = "L"
        info: dict = {}

        def convert(self, mode):
            return self

        def __array__(self, dtype=None, copy=None):
            return marker

    class _StubImage:
        @staticmethod
        def open(fp):
            return _StubIm()

    stub_pil = types.ModuleType("PIL")
    stub_pil.Image = _StubImage
    monkeypatch.setitem(sys.modules, "PIL", stub_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _StubImage)
    got = mm.decode_image_pixels(png)
    assert got.shape == (2, 2, 1)
    assert (got == 7).all()


def test_jpeg_stream_without_eoi():
    from pg_pb3_ld_spark.functions.jpeg import decode_jpeg_pixels

    blob = _gray_fixture_import()
    want = decode_jpeg_pixels(blob)
    assert blob.endswith(b"\xff\xd9")
    truncated = blob[:-2]  # ends mid-entropy-data, no EOI
    np.testing.assert_array_equal(decode_jpeg_pixels(truncated), want)
