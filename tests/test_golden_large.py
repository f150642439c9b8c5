"""Large embedded message golden — the reference's
TestLargeEmbeddedMessage (tests/test_test.go:362-389): a 16-column
insert whose 16th column is a 16 KiB string ('j' × 16384), with
columns 2-15 NULL.  16384 sits exactly past the 2-byte varint
boundary (16383 = 2^14−1), so the nested FieldSetDescription and the
change message both carry 3-byte length prefixes — the golden pins
the length-nesting math end-to-end, byte-identically.
"""

from __future__ import annotations

import numpy as np

from pg_pb3_ld_spark.config import EngineConfig
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.pb3.decoder import decode_frames
from pg_pb3_ld_spark.pb3.encoder import (
    FieldValue,
    WireBatcher,
    encode_field_set,
    encode_insert,
    encode_table,
)

# tenk1's 16 columns (tests/common.go:54-66 DDL order)
TENK1_COLS = [
    "unique1", "unique2", "two", "four", "ten", "twenty", "hundred",
    "thousand", "twothousand", "fivethous", "tenthous", "odd", "even",
    "stringu1", "stringu2", "string4",
]


def test_large_embedded_message_golden():
    cfg = EngineConfig()  # defaults: type_oids disabled, formats disabled
    big = "j" * 16384
    cols = [FieldValue("unique1", b"1", wire.OID_INT4)]
    for name in TENK1_COLS[1:15]:
        cols.append(FieldValue(name, None, wire.OID_INT4))
    cols.append(FieldValue("string4", big.encode(), wire.OID_NAME))

    td = encode_table("public", "tenk1")
    fsd = encode_field_set(cols, cfg.type_oids_mode, cfg.formats_mode)
    # nested length prefix must be 3 varint bytes (> 16383)
    assert len(fsd) > 16384
    body = encode_insert(td, fsd)
    batcher = WireBatcher(cfg)
    batcher.begin_txn()
    batcher.change(wire.WMSG_INSERT, body)
    batcher.commit_txn()
    frames = batcher.frames()
    assert len(frames) == 1

    batch = decode_frames(
        [frames[0][1]], np.array([frames[0][0]]), np.array([0])
    )
    rows = batch.to_pylist()
    ops = [r["op"] for r in rows]
    assert ops == ["BEGIN", "INSERT", "COMMIT"]
    ins = rows[1]
    assert ins["schema_name"] == "public"
    assert ins["table_name"] == "tenk1"
    assert ins["new_names"] == TENK1_COLS
    # null alignment: 1 non-null, 14 NULL, 1 non-null
    # (createNulls(options, 1, 14, 1) in the reference golden)
    assert ins["new_nulls"] == [False] + [True] * 14 + [False]
    assert bytes(ins["new_values"][0]) == b"1"
    assert all(bytes(v) == b"" for v in ins["new_values"][1:15])
    # the 16 KiB value survives byte-identically
    assert bytes(ins["new_values"][15]) == big.encode()


def test_large_value_varint_boundaries_batch():
    """Values straddling the 2→3-byte varint boundary in one frame:
    16383 / 16384 / 16385 bytes, all round-trip byte-exactly."""
    cfg = EngineConfig()
    batcher = WireBatcher(cfg)
    td = encode_table("public", "tenk1")
    sizes = [16383, 16384, 16385]
    batcher.begin_txn()
    for i, size in enumerate(sizes):
        cols = [
            FieldValue("unique1", str(i).encode(), wire.OID_INT4),
            FieldValue("string4", b"k" * size, wire.OID_NAME),
        ]
        batcher.change(
            wire.WMSG_INSERT,
            encode_insert(td, encode_field_set(cols)),
        )
    batcher.commit_txn()
    frames = batcher.frames()
    lsns = np.array([f[0] for f in frames], dtype=np.int64)
    seqs = np.arange(len(frames), dtype=np.int64)
    batch = decode_frames([f[1] for f in frames], lsns, seqs)
    inserts = [r for r in batch.to_pylist() if r["op"] == "INSERT"]
    assert len(inserts) == 3
    for i, (row, size) in enumerate(zip(inserts, sizes)):
        assert bytes(row["new_values"][0]) == str(i).encode()
        assert bytes(row["new_values"][1]) == b"k" * size
