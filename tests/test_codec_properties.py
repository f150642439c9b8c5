"""Property-based codec tests (Hypothesis) — the fuzzer analog
(SURVEY.md §5: random schemas/values à la tests/fuzzer/fuzzy.go)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pg_pb3_ld_spark.config import EngineConfig, OptionError, parse_binary_oid_ranges
from pg_pb3_ld_spark.pb3 import wire
from pg_pb3_ld_spark.pb3.decoder import decode_frames, read_varints
from pg_pb3_ld_spark.pb3.encoder import (
    FieldValue,
    WireBatcher,
    encode_field_set,
    encode_insert,
    encode_table,
    encode_varint,
)

_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=63
).filter(lambda s: not s[0].isdigit())


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_stream(values):
    blob = b"".join(encode_varint(v) for v in values)
    data = np.frombuffer(blob, dtype=np.uint8)
    pos = np.zeros(1, dtype=np.int64)
    got = []
    for _ in values:
        v, pos = read_varints(data, pos)
        got.append(int(v[0]))
    assert got == values
    assert int(pos[0]) == len(blob)


@given(
    st.lists(
        st.tuples(
            _ident,
            st.one_of(st.none(), st.binary(min_size=0, max_size=300)),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from(["disabled", "omit_nulls", "full"]),
    st.sampled_from(["disabled", "omit_nulls", "full"]),
)
@settings(max_examples=100, deadline=None)
def test_fieldset_roundtrip_any_modes(cols, oid_mode, fmt_mode):
    """Random column sets round-trip under every mode combination,
    including the omit_nulls realignment paths (fsd.c:253-294)."""
    fvs = [
        FieldValue(name, val, wire.OID_BYTEA if val is not None else wire.OID_TEXT,
                   is_binary=val is not None)
        for name, val in cols
    ]
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
    row = batch.to_pylist()[0]
    assert row["new_names"] == [c.name for c in fvs]
    assert row["new_nulls"] == [c.value is None for c in fvs]
    assert row["new_values"] == [c.value or b"" for c in fvs]
    if oid_mode == "full":
        assert row["new_oids"] == [c.type_oid for c in fvs]
    if fmt_mode == "full":
        assert row["new_formats"] == [
            c.value is not None for c in fvs
        ]


@given(st.text(alphabet="0123456789,- ", max_size=30))
@settings(max_examples=300, deadline=None)
def test_oid_ranges_parser_never_crashes_and_sorted(inp):
    """Parser either raises OptionError or returns ordered,
    non-overlapping ranges (utils.c:138-149 invariant)."""
    try:
        ranges = parse_binary_oid_ranges(inp)
    except OptionError:
        return
    flat = [x for r in ranges for x in r]
    assert flat == sorted(flat)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
