"""Wide-schema / large-value codec fuzz parity with the reference
fuzzer's envelope (VERDICT round-2 ask #3).

The reference fuzzer generates tables of 1–511 columns
(``tests/fuzzer/fuzzy.go:36-63``) and PG itself allows
MaxHeapAttributeNumber=1600 (``decoder/pg_pb3_ld.h:10``,
NUM_MAX_COLUMNS).  The round-2 property tests capped at 40 columns /
300-byte values — the lockstep decoder's per-message iteration count
grows with field count, exactly the regime those tests never entered.
This file raises the envelope:

* ``test_wide_fieldset_roundtrip`` — up to 511 columns, all three
  type_oids × formats mode combinations, ``max_examples=50``, with a
  1 s per-example deadline (the vectorized decoder is O(total bytes),
  so width alone must not blow the per-example cost; 1 s still trips
  instantly on a width-quadratic regression while tolerating the
  sandbox host's 2-7x throttle phases).
* ``test_varint_boundary_values`` — values whose LENGTHS sit on every
  LEB128 length-prefix boundary class incl. the 2,097,153-byte class
  (4-byte varint), i.e. multi-MiB single values.
* ``test_1600_column_bound`` — the explicit NUM_MAX_COLUMNS case.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

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


def _roundtrip_one(fvs, oid_mode, fmt_mode):
    cfg = EngineConfig(
        type_oids_mode=oid_mode, formats_mode=fmt_mode,
        begin_messages=False, commit_messages=False,
    )
    b = WireBatcher(cfg)
    td = encode_table("s", "t")
    b.begin_txn()
    b.change(wire.WMSG_INSERT, encode_insert(
        td, encode_field_set(fvs, oid_mode, fmt_mode)
    ))
    b.commit_txn()
    frames = b.frames()
    batch = decode_frames(
        [f for _, f in frames],
        np.array([l for l, _ in frames], dtype=np.int64),
        np.arange(len(frames), dtype=np.int64),
        cfg,
    )
    return batch.to_pylist()[0]


def _check_row(row, fvs, oid_mode, fmt_mode):
    assert row["new_names"] == [c.name for c in fvs]
    assert row["new_nulls"] == [c.value is None for c in fvs]
    assert row["new_values"] == [c.value or b"" for c in fvs]
    if oid_mode == "full":
        assert row["new_oids"] == [c.type_oid for c in fvs]
    if fmt_mode == "full":
        assert row["new_formats"] == [c.value is not None for c in fvs]


# ------------------------------------------------------------------
# wide profile: 1-511 columns (fuzzy.go:36-63 envelope)
# ------------------------------------------------------------------

@st.composite
def _wide_cols(draw):
    """Column count drawn across the FULL fuzzer range with short
    values (width is the variable under test, not byte volume):
    Hypothesis shrinks toward small counts, so force coverage of the
    deep end by sampling count from the whole [1, 511] range."""
    n = draw(st.integers(min_value=1, max_value=511))
    # deterministic distinct names; per-column null/len from the draw
    nulls = draw(
        st.lists(st.booleans(), min_size=n, max_size=n)
    )
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    cols = []
    for i in range(n):
        val = None if nulls[i] else rng.bytes(int(rng.integers(0, 24)))
        cols.append(
            FieldValue(
                f"c{i:04d}", val,
                wire.OID_BYTEA if val is not None else wire.OID_TEXT,
                is_binary=val is not None,
            )
        )
    return cols


@given(
    _wide_cols(),
    st.sampled_from(["disabled", "omit_nulls", "full"]),
    st.sampled_from(["disabled", "omit_nulls", "full"]),
)
# deadline=1000: still a hard per-example cost guard (a width-
# quadratic decode would blow 1 s instantly at 511 columns), but with
# headroom for the sandbox host's measured 2-7x per-core throttle
# phases — the Hypothesis default 200 ms flaked at 224 ms under load
@settings(max_examples=50, deadline=1000)
def test_wide_fieldset_roundtrip(cols, oid_mode, fmt_mode):
    row = _roundtrip_one(cols, oid_mode, fmt_mode)
    _check_row(row, cols, oid_mode, fmt_mode)


# ------------------------------------------------------------------
# large values: every LEB128 length-prefix boundary class
# ------------------------------------------------------------------

# lengths around each varint width switchover: 1→2 bytes at 128,
# 2→3 at 16384, 3→4 at 2097152 (the 2,097,153-byte class is a
# multi-MiB single value with a 4-byte length prefix)
_BOUNDARY_LENGTHS = [
    0, 1, 127, 128, 129,
    16383, 16384, 16385,
    2097151, 2097152, 2097153,
]


@given(
    st.sampled_from(_BOUNDARY_LENGTHS),
    st.integers(min_value=0, max_value=255),
    st.sampled_from(["disabled", "omit_nulls", "full"]),
)
@settings(max_examples=50, deadline=None)  # 2 MiB encode dominates, not decode
def test_varint_boundary_values(length, fill, oid_mode):
    val = bytes([fill]) * length
    fvs = [
        FieldValue("pre", b"x", wire.OID_BYTEA, is_binary=True),
        FieldValue("big", val, wire.OID_BYTEA, is_binary=True),
        FieldValue("post", None, wire.OID_TEXT),
    ]
    row = _roundtrip_one(fvs, oid_mode, "disabled")
    _check_row(row, fvs, oid_mode, "disabled")


def test_multi_mib_value_exact():
    """A 5 MiB value (beyond the 4 MiB frame flush target — one
    oversized message forms its own frame, pg_pb3_ld.c:417-422) must
    survive byte-exact."""
    val = np.random.default_rng(9).bytes(5 * 1024 * 1024)
    fvs = [FieldValue("blob", val, wire.OID_BYTEA, is_binary=True)]
    row = _roundtrip_one(fvs, "omit_nulls", "disabled")
    assert row["new_values"] == [val]


# ------------------------------------------------------------------
# the PG hard bound: 1600 columns (NUM_MAX_COLUMNS, pg_pb3_ld.h:10)
# ------------------------------------------------------------------

def test_1600_column_bound():
    rng = np.random.default_rng(1600)
    fvs = []
    for i in range(1600):
        null = bool(rng.integers(0, 4) == 0)
        val = None if null else rng.bytes(int(rng.integers(0, 16)))
        fvs.append(
            FieldValue(
                f"col_{i:04d}", val,
                wire.OID_BYTEA if val is not None else wire.OID_TEXT,
                is_binary=val is not None,
            )
        )
    for oid_mode, fmt_mode in (
        ("full", "full"), ("omit_nulls", "omit_nulls"), ("disabled", "disabled"),
    ):
        row = _roundtrip_one(fvs, oid_mode, fmt_mode)
        _check_row(row, fvs, oid_mode, fmt_mode)


# ------------------------------------------------------------------
# wide schema through the TYPED decode path (the merge hot path)
# ------------------------------------------------------------------

def test_wide_schema_typed_decode():
    """A 200-column target schema through decode_frame_typed: every
    value lands in its own typed column with correct _set flags; the
    key still resolves.  (The typed path iterates per schema column —
    this pins correctness in the wide regime the reference fuzzer
    generates, fuzzy.go:36-63.)"""
    from pg_pb3_ld_spark.pb3.decoder import decode_frame_typed
    from pg_pb3_ld_spark.schema import TargetColumn, TargetSchema

    import pyarrow as pa

    n_cols = 200
    cols = [TargetColumn("k", 25, "string", is_key=True)]
    cols += [TargetColumn(f"v{i:03d}", 25, "string") for i in range(n_cols)]
    schema = TargetSchema("wide", cols)

    rng = np.random.default_rng(77)
    present = {i: bool(rng.integers(0, 2)) for i in range(n_cols)}
    fvs = [FieldValue("k", b"row0", 25)]
    for i in range(n_cols):
        if present[i]:
            fvs.append(FieldValue(f"v{i:03d}", f"val{i}".encode(), 25))

    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        begin_messages=False, commit_messages=False,
    )
    b = WireBatcher(cfg)
    td = encode_table("s", "wide")
    b.begin_txn()
    b.change(wire.WMSG_INSERT, encode_insert(
        td, encode_field_set(fvs, cfg.type_oids_mode)
    ))
    b.commit_txn()
    frames = b.frames()
    batch = decode_frame_typed(
        pa.array([f for _, f in frames], pa.binary()),
        np.array([l for l, _ in frames], dtype=np.int64),
        np.arange(len(frames), dtype=np.int64),
        schema, cfg,
    )
    row = batch.to_pylist()[0]
    assert row["op"] == "INSERT" and row["k"] == "row0"
    for i in range(n_cols):
        name = f"v{i:03d}"
        if present[i]:
            assert row[name] == f"val{i}", name
            assert row[f"{name}_set"] is True
        else:
            assert row[name] is None
            assert row[f"{name}_set"] is False
    # no spurious evolution probe: all wire columns are known
    assert row["_x_names"] is None
