"""Wire-codec tests: goldens + encoder/decoder round-trips.

Mirrors the reference's golden-message strategy
(``tests/common.go:161-307``; ``tests/test_test.go``): hand-assembled
expected bytes for the framing and field layout, the varint-boundary
value-length sweep of ``test_test.go:90-168``, the TOAST
column-omission case of ``test_test.go:230-301``, and
fuzzer-style randomized round-trips (``tests/fuzzer/fuzzy.go:36-89``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.pb3.decoder import (
    decode_frames,
    parse_streams,
    read_varints,
)
from pg_pb3_ld_spark.pb3.encoder import (
    FieldValue,
    WireBatcher,
    encode_delete,
    encode_field_set,
    encode_insert,
    encode_table,
    encode_update,
    encode_varint,
)
from pg_pb3_ld_spark.pb3.pgtypes import decode_column, encode_value


# --------------------------------------------------------------- varints

@pytest.mark.parametrize(
    "value,expected",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (129, b"\x81\x01"),
        (16383, b"\xff\x7f"),
        (16384, b"\x80\x80\x01"),
        (16385, b"\x81\x80\x01"),
        (2097151, b"\xff\xff\x7f"),
        (2097152, b"\x80\x80\x80\x01"),
        (2097153, b"\x81\x80\x80\x01"),
        (268435455, b"\xff\xff\xff\x7f"),
        (268435456, b"\x80\x80\x80\x80\x01"),
    ],
)
def test_varint_boundaries(value, expected):
    # the same 1/2/3/4-byte boundaries test_test.go:90-168 sweeps
    assert encode_varint(value) == expected
    data = np.frombuffer(expected + b"\x00", dtype=np.uint8)
    vals, pos = read_varints(data, np.array([0], dtype=np.int64))
    assert int(vals[0]) == value
    assert int(pos[0]) == len(expected)


def test_read_varints_vectorized_multi_position():
    blob = b"".join(encode_varint(v) for v in [0, 300, 127, 128, 2**32])
    data = np.frombuffer(blob, dtype=np.uint8)
    starts = []
    p = 0
    for v in [0, 300, 127, 128, 2**32]:
        starts.append(p)
        p += len(encode_varint(v))
    vals, _ = read_varints(data, np.array(starts, dtype=np.int64))
    assert vals.tolist() == [0, 300, 127, 128, 2**32]


# ------------------------------------------------------------- framing

def _golden_insert_frame():
    """Hand-assembled single-INSERT frame, byte for byte.

    Layout per decoder/utils.c:184-189 and fsd.c:229-301 with
    type_oids disabled / formats disabled (the defaults,
    pg_pb3_ld.c:108-117).
    """
    td = encode_table("public", "t1")
    # TableDescription: field1 "public", field2 "t1"
    assert td == b"\x0a\x06public\x12\x02t1"
    fsd = encode_field_set(
        [
            FieldValue("id", b"1", wire.OID_INT4),
            FieldValue("txt", None, wire.OID_TEXT),
        ]
    )
    # names field 2 (key 0x12), values field 3 (key 0x1a),
    # nulls field 5 (key 0x2a)
    assert fsd == (
        b"\x12\x02id" + b"\x1a\x011" +
        b"\x12\x03txt" + b"\x1a\x00" +
        b"\x2a\x02\x00\x01"
    )
    ins = encode_insert(td, fsd)
    batcher = WireBatcher(EngineConfig(begin_messages=False, commit_messages=False))
    batcher.begin_txn()
    batcher.change(wire.WMSG_INSERT, ins)
    batcher.commit_txn()
    frames = batcher.frames()
    assert len(frames) == 1
    lsn, frame = frames[0]
    # header: types field1 (key 0x08) value 2; offsets field2 (0x10) 0
    expected_header = b"\x08\x02\x10\x00"
    assert frame == encode_varint(len(expected_header)) + expected_header + ins
    return lsn, frame


def test_golden_insert_frame_bytes():
    _golden_insert_frame()


def _decode_one(frames, config=None):
    lsns = np.array([l for l, _ in frames], dtype=np.int64)
    seqs = np.arange(len(frames), dtype=np.int64)
    return decode_frames([f for _, f in frames], lsns, seqs, config)


def test_decode_golden_insert():
    lsn, frame = _golden_insert_frame()
    batch = _decode_one([(lsn, frame)])
    assert batch.num_rows == 1
    row = batch.to_pylist()[0]
    assert row["op"] == "INSERT"
    assert row["schema_name"] == "public"
    assert row["table_name"] == "t1"
    assert row["table_oid"] is None
    assert row["new_names"] == ["id", "txt"]
    assert row["new_values"] == [b"1", b""]
    assert row["new_nulls"] == [False, True]
    assert row["key_names"] == []


def test_begin_commit_and_txn_cycle():
    cfg = EngineConfig()  # begin+commit messages on
    b = WireBatcher(cfg)
    td = encode_table("public", "t1", table_oid=4242)
    b.begin_txn()
    b.change(wire.WMSG_INSERT, encode_insert(
        td, encode_field_set([FieldValue("id", b"7", wire.OID_INT4)])
    ))
    b.change(wire.WMSG_UPDATE, encode_update(
        td,
        encode_field_set([FieldValue("id", b"7", wire.OID_INT4)]),
        encode_field_set([FieldValue("id", b"8", wire.OID_INT4)]),
    ))
    b.change(wire.WMSG_DELETE, encode_delete(
        td, encode_field_set([FieldValue("id", b"8", wire.OID_INT4)])
    ))
    b.commit_txn()
    # empty txn with begin messages ON: the BEGIN already sits in the
    # header buffer, so the reference emits a BEGIN+COMMIT-only frame
    # (pg_pb3_ld.c:254-258 suppresses only when the header is empty;
    # test_test.go:65-85 expects exactly this)
    b.begin_txn()
    b.commit_txn()
    frames = b.frames()
    assert len(frames) == 2
    batch = _decode_one(frames)
    ops = [r["op"] for r in batch.to_pylist()]
    assert ops == ["BEGIN", "INSERT", "UPDATE", "DELETE", "COMMIT",
                   "BEGIN", "COMMIT"]
    rows = batch.to_pylist()[:5]
    assert rows[1]["table_oid"] == 4242
    # UPDATE: key from key_fields, new values from new_values
    assert rows[2]["key_values"] == [b"7"]
    assert rows[2]["new_values"] == [b"8"]
    assert rows[3]["key_values"] == [b"8"]
    # offset_idx preserves intra-frame WAL order (utils.c:161-166)
    assert [r["offset_idx"] for r in rows] == [0, 1, 2, 3, 4]


def test_empty_txn_suppressed_without_begin_messages():
    # with begin/commit messages off, an empty txn emits nothing at
    # all (pg_pb3_ld.c:254-258)
    b = WireBatcher(EngineConfig(begin_messages=False, commit_messages=False))
    b.begin_txn()
    b.commit_txn()
    assert b.frames() == []


def test_toast_column_omission():
    """UPDATE omitting an unchanged TOAST column — test_test.go:230-301.

    The wire field set simply lacks the column; the decoder must
    surface 15-of-16 columns with no placeholder."""
    cols_full = [
        FieldValue(f"c{i}", str(i).encode(), wire.OID_INT4) for i in range(16)
    ]
    cols_omitted = cols_full[:7] + cols_full[8:]  # c7 omitted, not null
    td = encode_table("public", "tenk")
    b = WireBatcher(EngineConfig(begin_messages=False, commit_messages=False))
    b.begin_txn()
    b.change(wire.WMSG_UPDATE, encode_update(
        td,
        encode_field_set([FieldValue("c0", b"0", wire.OID_INT4)]),
        encode_field_set(cols_omitted),
    ))
    b.commit_txn()
    batch = _decode_one(b.frames())
    row = batch.to_pylist()[0]
    assert len(row["new_names"]) == 15
    assert "c7" not in row["new_names"]
    assert row["new_nulls"] == [False] * 15  # absent ≠ NULL


def test_multi_frame_flush_on_size_target():
    """A txn larger than the flush target spans frames; commit flushes
    the tail (pg_pb3_ld.c:417-422, 266-271)."""
    cfg = EngineConfig(wire_message_target_size=4096)
    b = WireBatcher(cfg)
    td = encode_table("public", "big")
    b.begin_txn()
    payload = b"x" * 1500
    for i in range(10):
        b.change(wire.WMSG_INSERT, encode_insert(
            td,
            encode_field_set([
                FieldValue("id", str(i).encode(), wire.OID_INT4),
                FieldValue("blob", payload, wire.OID_BYTEA, is_binary=True),
            ]),
        ))
    b.commit_txn()
    frames = b.frames()
    assert len(frames) > 1
    # LSNs strictly increase across frames (fuzzer.go:506-526 idiom)
    lsns = [l for l, _ in frames]
    assert lsns == sorted(lsns) and len(set(lsns)) == len(lsns)
    batch = _decode_one(frames)
    rows = batch.to_pylist()
    assert [r["op"] for r in rows].count("INSERT") == 10
    assert [r["op"] for r in rows].count("COMMIT") == 1
    assert [r["op"] for r in rows].count("BEGIN") == 1
    # frame_seq/lsn carried onto every decoded message
    assert all(r["lsn"] in lsns for r in rows)


@pytest.mark.parametrize("value_len", [
    109, 110, 111, 112, 113,            # around the 127-byte 1/2 boundary
    16364, 16365, 16366, 16367, 16368,  # around 16384
    2097131, 2097132, 2097133, 2097134,  # around 2097152
])
def test_varint_boundary_value_lengths(value_len):
    """Value lengths straddling varint-length boundaries —
    test_test.go:90-168 / exhaustive.go:40-76."""
    v = bytes((i % 251 for i in range(value_len)))
    td = encode_table("public", "tbl_identity_full")
    b = WireBatcher(EngineConfig(begin_messages=False, commit_messages=False))
    b.begin_txn()
    b.change(wire.WMSG_INSERT, encode_insert(
        td,
        encode_field_set([
            FieldValue("f1", b"1", wire.OID_INT4),
            FieldValue("f2", v, wire.OID_BYTEA, is_binary=True),
        ]),
    ))
    b.commit_txn()
    batch = _decode_one(b.frames())
    row = batch.to_pylist()[0]
    assert row["new_values"][1] == v


def test_type_oids_and_formats_modes():
    """Mode matrix — formats_test.go / type_oids_test.go analog.

    omit_nulls oid/format vectors must be re-aligned to columns."""
    cols = [
        FieldValue("a", b"\x00\x00\x00\x01", wire.OID_INT4, is_binary=True),
        FieldValue("b", None, wire.OID_TEXT),
        FieldValue("c", b"hi", wire.OID_TEXT),
    ]
    for oid_mode in ("disabled", "omit_nulls", "full"):
        for fmt_mode in ("disabled", "omit_nulls", "full"):
            cfg = EngineConfig(
                type_oids_mode=oid_mode, formats_mode=fmt_mode,
                begin_messages=False, commit_messages=False,
                binary_oid_ranges="23" if fmt_mode == "disabled" else "",
            )
            b = WireBatcher(cfg)
            td = encode_table("public", "m")
            b.begin_txn()
            b.change(wire.WMSG_INSERT, encode_insert(
                td, encode_field_set(cols, cfg.type_oids_mode, cfg.formats_mode)
            ))
            b.commit_txn()
            batch = _decode_one(b.frames(), cfg)
            row = batch.to_pylist()[0]
            assert row["new_names"] == ["a", "b", "c"]
            assert row["new_nulls"] == [False, True, False]
            if oid_mode == "full":
                assert row["new_oids"] == [wire.OID_INT4, wire.OID_TEXT, wire.OID_TEXT]
            elif oid_mode == "omit_nulls":
                # null column's oid unknown on the wire → 0
                assert row["new_oids"] == [wire.OID_INT4, 0, wire.OID_TEXT]
            else:
                assert row["new_oids"] == [0, 0, 0]
            if fmt_mode == "disabled" and oid_mode == "disabled":
                # no formats and no oids → consumer can't resolve
                assert row["new_formats"] == [False, False, False]
            else:
                expected_fmt = [True, False, False]
                if fmt_mode == "disabled":
                    # resolved via configured binary_oid_ranges
                    expected_fmt = [oid_mode != "disabled", False, False]
                assert row["new_formats"] == expected_fmt


def test_large_embedded_message():
    # 16 KiB embedded value — test_test.go:362-389
    v = b"q" * 16384
    td = encode_table("s", "t")
    b = WireBatcher(EngineConfig(begin_messages=False, commit_messages=False))
    b.begin_txn()
    b.change(wire.WMSG_INSERT, encode_insert(
        td, encode_field_set([FieldValue("v", v, wire.OID_TEXT)])
    ))
    b.commit_txn()
    row = _decode_one(b.frames()).to_pylist()[0]
    assert row["new_values"][0] == v


# ----------------------------------------------------- typed value casts

def test_decode_column_int4_mixed_formats():
    vals = pa.array([b"42", b"\xff\xff\xff\xd6", b"", b"-7"], pa.binary())
    is_null = np.array([False, False, True, False])
    is_bin = np.array([False, True, False, False])
    out = decode_column(vals, is_null, is_bin, wire.OID_INT4, "int")
    assert out.to_pylist() == [42, -42, None, -7]


def test_decode_column_float_and_int8():
    import struct

    vals = pa.array(
        [struct.pack(">d", 1.5), b"2.25"], pa.binary()
    )
    out = decode_column(
        vals, np.array([False, False]), np.array([True, False]),
        wire.OID_FLOAT8, "double",
    )
    assert out.to_pylist() == [1.5, 2.25]
    vals = pa.array([struct.pack(">q", -(2**40)), b"123456789012"], pa.binary())
    out = decode_column(
        vals, np.array([False, False]), np.array([True, False]),
        wire.OID_INT8, "bigint",
    )
    assert out.to_pylist() == [-(2**40), 123456789012]


def test_decode_column_timestamptz_both_forms():
    import datetime

    dt = datetime.datetime(2025, 3, 14, 15, 9, 26, 535897,
                           tzinfo=datetime.timezone.utc)
    tb = encode_value(dt, wire.OID_TIMESTAMPTZ, binary=True)
    tt = encode_value(dt, wire.OID_TIMESTAMPTZ, binary=False)
    vals = pa.array([tb, tt, b""], pa.binary())
    out = decode_column(
        vals, np.array([False, False, True]),
        np.array([True, False, False]),
        wire.OID_TIMESTAMPTZ, "timestamp",
    )
    got = out.to_pylist()
    assert got[0] == dt and got[1] == dt and got[2] is None


def test_decode_column_bytea_hex_and_binary():
    raw = bytes(range(20))
    vals = pa.array([b"\\x" + raw.hex().encode(), raw, b""], pa.binary())
    out = decode_column(
        vals, np.array([False, False, True]),
        np.array([False, True, False]),
        wire.OID_BYTEA, "binary",
    )
    assert out.to_pylist() == [raw, raw, None]


def test_decode_column_text_types():
    vals = pa.array(["héllo".encode(), b"", b"world"], pa.binary())
    out = decode_column(
        vals, np.array([False, True, False]),
        np.array([False, False, False]),
        wire.OID_TEXT, "string",
    )
    assert out.to_pylist() == ["héllo", None, "world"]


# ---------------------------------------------------- randomized roundtrip

def test_fuzz_roundtrip_random_schemas():
    """fuzzy.go:36-89-style randomized round-trip: random schemas
    (varied widths), random ops, 5% NULLs, boundary-biased bytea."""
    rng = np.random.default_rng(42)
    type_pool = [wire.OID_INT4, wire.OID_INT8, wire.OID_FLOAT4,
                 wire.OID_FLOAT8, wire.OID_BYTEA, wire.OID_TEXT]
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="1-200000",  # fuzzer.go:236-240 options
        wire_message_target_size=64 * 1024,
    )
    b = WireBatcher(cfg)
    expected = []  # (op, names, values(bytes|None))
    for _ in range(30):  # transactions
        b.begin_txn()
        ncols = int(rng.integers(1, 12))
        names = [f"col_{j}" for j in range(ncols)]
        oids = [type_pool[int(rng.integers(len(type_pool)))] for _ in range(ncols)]
        td = encode_table("public", f"t_{int(rng.integers(1000))}")
        for _ in range(int(rng.integers(1, 6))):
            colvals = []
            for name, oid in zip(names, oids):
                if rng.random() < 0.05:
                    colvals.append(FieldValue(name, None, oid))
                    continue
                binary = cfg.binary_output_for(oid)
                if oid == wire.OID_INT4:
                    raw = encode_value(int(rng.integers(-2**31, 2**31)), oid, binary)
                elif oid == wire.OID_INT8:
                    raw = encode_value(int(rng.integers(-2**62, 2**62)), oid, binary)
                elif oid in (wire.OID_FLOAT4, wire.OID_FLOAT8):
                    raw = encode_value(float(np.float32(rng.normal())), oid, binary)
                elif oid == wire.OID_BYTEA:
                    # boundary-biased lengths (exhaustive.go:40-76)
                    base = int(rng.choice([0, 10, 127, 128, 300]))
                    raw = encode_value(
                        bytes(rng.integers(0, 256, base, dtype=np.uint8)),
                        oid, binary)
                else:
                    raw = encode_value(f"s{int(rng.integers(1e6))}", oid, binary)
                colvals.append(FieldValue(name, raw, oid, is_binary=binary))
            body = encode_field_set(colvals, cfg.type_oids_mode, cfg.formats_mode)
            b.change(wire.WMSG_INSERT, encode_insert(td, body))
            expected.append([
                (c.name, c.value, c.value is None) for c in colvals
            ])
        b.commit_txn()
    batch = _decode_one(b.frames(), cfg)
    got = [r for r in batch.to_pylist() if r["op"] == "INSERT"]
    assert len(got) == len(expected)
    for row, exp in zip(got, expected):
        assert row["new_names"] == [e[0] for e in exp]
        assert row["new_values"] == [e[1] if e[1] is not None else b"" for e in exp]
        assert row["new_nulls"] == [e[2] for e in exp]
        # binary resolution via configured oid ranges works with
        # formats disabled + oids omit_nulls
        for (name, val, isnull), got_fmt, got_oid in zip(
            exp, row["new_formats"], row["new_oids"]
        ):
            if not isnull:
                assert got_fmt == cfg.binary_output_for(got_oid)
