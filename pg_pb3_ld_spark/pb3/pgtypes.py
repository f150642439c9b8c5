"""Vectorized decoding of PostgreSQL value encodings → Arrow arrays.

The reference emits values as PostgreSQL *output-function* bytes —
text form (``OidOutputFunctionCall``) or binary send form
(``OidSendFunctionCall``) selected per type OID
(``decoder/fsd.c:150-199``).  This module inverts both forms for the
types the reference's tests exercise (int4/name/text —
``tests/common.go:20`` — plus the fuzzer's int8/float4/float8/bytea,
``tests/fuzzer/fuzzer.go:27-102``) and the timestamp types the
transcripts table needs, without per-row Python: binary fixed-width
values are a single big-endian ``np.frombuffer`` view; text numerics
go through ``pyarrow.compute.cast`` on a sliced string array.

PG epoch note: binary timestamps are microseconds since 2000-01-01
(PG_EPOCH_US below converts to the unix epoch arrow expects).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pg_pb3_ld_spark.pb3 import wire

PG_EPOCH_US = 946_684_800_000_000  # 2000-01-01 00:00:00 UTC in unix µs


def _fixed_width_be(packed: np.ndarray, offsets: np.ndarray,
                    sel: np.ndarray, width: int, dtype: str) -> np.ndarray:
    """Gather ``width``-byte big-endian values at selected slots."""
    starts = offsets[:-1][sel]
    lens = offsets[1:][sel] - starts
    if (lens != width).any():
        raise ValueError(
            f"binary value length != {width} for fixed-width pg type"
        )
    if len(starts) == 0:
        return np.zeros(0, dtype=dtype)
    idx = (starts[:, None] + np.arange(width)).ravel()
    raw = packed[idx].tobytes()
    return np.frombuffer(raw, dtype=">" + dtype).astype(dtype)


def _string_view(values: pa.Array) -> pa.Array:
    """Reinterpret a binary array's buffers as utf8 (zero-copy)."""
    return values.cast(pa.string())


def decode_column(
    values: pa.Array,
    is_null: np.ndarray,
    is_binary: np.ndarray,
    type_oid: int,
    spark_type: str,
) -> pa.Array:
    """Decode one logical column's wire values into a typed array.

    ``values`` is the per-row binary array (empty bytes where NULL);
    ``is_binary`` marks rows sent in binary send-function form.  Rows
    may mix text and binary within one batch (per-message formats).
    """
    n = len(values)
    if n == 0:
        return pa.nulls(0, _arrow_type(spark_type))
    buffers = values.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1).astype(np.int64)
    packed = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    valid = ~is_null
    bin_sel = valid & is_binary
    txt_sel = valid & ~is_binary

    if type_oid in (wire.OID_TEXT, wire.OID_NAME, wire.OID_VARCHAR):
        # text and binary send form are both raw utf8 for these types
        out = _string_view(values)
        return pc.if_else(pa.array(valid), out, pa.nulls(n, pa.string()))

    if type_oid == wire.OID_BYTEA:
        result = values
        if txt_sel.any():
            # text form is \x-prefixed hex (bytea_output=hex)
            result = _decode_bytea_hex(values, packed, offsets, txt_sel)
        return pc.if_else(pa.array(valid), result, pa.nulls(n, pa.binary()))

    # numeric / temporal: decode text and binary selections separately
    np_dtype, arrow_type, width = _NUMERIC[type_oid]
    out = np.zeros(n, dtype=np_dtype)
    if bin_sel.any():
        out[bin_sel] = _fixed_width_be(packed, offsets, bin_sel, width, np_dtype)
    if txt_sel.any():
        txt = _string_view(values.take(pa.array(np.flatnonzero(txt_sel), pa.int64())))
        if type_oid in (wire.OID_TIMESTAMP, wire.OID_TIMESTAMPTZ):
            import pandas as pd

            parsed = pd.to_datetime(
                txt.to_pandas(), utc=(type_oid == wire.OID_TIMESTAMPTZ),
                format="ISO8601",
            )
            micros = parsed.astype("int64") // 1000
            out[txt_sel] = micros.to_numpy()
        else:
            casted = pc.cast(txt, _TEXT_CAST[type_oid])
            out[txt_sel] = casted.to_numpy(zero_copy_only=False)
    if type_oid in (wire.OID_TIMESTAMP, wire.OID_TIMESTAMPTZ):
        if bin_sel.any():
            out[bin_sel] += PG_EPOCH_US
        arr = pa.array(out, pa.int64(), mask=~valid)
        return arr.cast(arrow_type)
    if type_oid == wire.OID_BOOL:
        if txt_sel.any():
            # text form is 't'/'f'
            first = np.zeros(n, dtype=np.uint8)
            starts = offsets[:-1][txt_sel]
            first[txt_sel] = packed[starts]
            out[txt_sel] = (first[txt_sel] == ord("t")).astype(np_dtype)
        return pa.array(out.astype(bool), pa.bool_(), mask=~valid)
    return pa.array(out, arrow_type, mask=~valid)


def _decode_bytea_hex(values, packed, offsets, txt_sel):
    """Vectorized ``\\x…`` hex decode for text-form bytea rows."""
    n = len(values)
    starts = offsets[:-1].copy()
    lens = offsets[1:] - starts
    # strip the 2-byte "\x" prefix on text rows
    starts2 = np.where(txt_sel, starts + 2, starts)
    lens2 = np.where(txt_sel, lens - 2, lens)
    if (lens2 < 0).any() or (lens2[txt_sel] % 2 != 0).any():
        raise ValueError("malformed bytea hex value")
    out_lens = np.where(txt_sel, lens2 // 2, lens)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offsets[1:])
    total = out_offsets[-1]
    out = np.zeros(total, dtype=np.uint8)
    # copy binary rows verbatim
    bin_rows = np.flatnonzero(~txt_sel)
    if len(bin_rows):
        dst = np.repeat(out_offsets[:-1][bin_rows], lens[bin_rows]) + _intra(lens[bin_rows])
        out[dst] = packed[np.repeat(starts[bin_rows], lens[bin_rows]) + _intra(lens[bin_rows])]
    # hex rows: two input chars → one output byte
    hex_rows = np.flatnonzero(txt_sel)
    if len(hex_rows):
        nib_idx = np.repeat(starts2[hex_rows], lens2[hex_rows]) + _intra(lens2[hex_rows])
        nibbles = packed[nib_idx]
        vals = np.where(
            nibbles >= ord("a"), nibbles - ord("a") + 10,
            np.where(nibbles >= ord("A"), nibbles - ord("A") + 10,
                     nibbles - ord("0")),
        ).astype(np.uint8)
        hi = vals[0::2]
        lo = vals[1::2]
        byte_dst = np.repeat(out_offsets[:-1][hex_rows], out_lens[hex_rows]) + _intra(out_lens[hex_rows])
        out[byte_dst] = (hi << 4) | lo
    if out_offsets[-1] > np.iinfo(np.int32).max:
        raise ValueError("bytea batch exceeds 2 GiB")
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(out_offsets.astype(np.int32)), pa.py_buffer(out)],
    )


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), … intra-slice offsets."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    cum = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=cum[1:])
    return np.arange(total) - np.repeat(cum, lens)


_NUMERIC = {
    wire.OID_INT2: ("i2", pa.int16(), 2),
    wire.OID_INT4: ("i4", pa.int32(), 4),
    wire.OID_INT8: ("i8", pa.int64(), 8),
    wire.OID_FLOAT4: ("f4", pa.float32(), 4),
    wire.OID_FLOAT8: ("f8", pa.float64(), 8),
    wire.OID_BOOL: ("u1", pa.bool_(), 1),
    wire.OID_TIMESTAMP: ("i8", pa.timestamp("us"), 8),
    wire.OID_TIMESTAMPTZ: ("i8", pa.timestamp("us", tz="UTC"), 8),
}

_TEXT_CAST = {
    wire.OID_INT2: pa.int16(),
    wire.OID_INT4: pa.int32(),
    wire.OID_INT8: pa.int64(),
    wire.OID_FLOAT4: pa.float32(),
    wire.OID_FLOAT8: pa.float64(),
}


def _arrow_type(spark_type: str) -> pa.DataType:
    return {
        "string": pa.string(),
        "binary": pa.binary(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }[spark_type]


def encode_value(value, type_oid: int, binary: bool) -> bytes:
    """Producer-side single-value encoder (test/bench generator only).

    Mirrors PostgreSQL's output/send functions for the supported
    types; the vectorized ``decode_column`` must invert this exactly.
    """
    import datetime
    import struct

    if binary:
        if type_oid == wire.OID_INT2:
            return struct.pack(">h", value)
        if type_oid == wire.OID_INT4:
            return struct.pack(">i", value)
        if type_oid == wire.OID_INT8:
            return struct.pack(">q", value)
        if type_oid == wire.OID_FLOAT4:
            return struct.pack(">f", value)
        if type_oid == wire.OID_FLOAT8:
            return struct.pack(">d", value)
        if type_oid == wire.OID_BOOL:
            return b"\x01" if value else b"\x00"
        if type_oid == wire.OID_BYTEA:
            return bytes(value)
        if type_oid in (wire.OID_TIMESTAMP, wire.OID_TIMESTAMPTZ):
            if isinstance(value, datetime.datetime):
                if value.tzinfo is None:
                    value = value.replace(tzinfo=datetime.timezone.utc)
                micros = int(value.timestamp() * 1_000_000)
            else:
                micros = int(value)
            return struct.pack(">q", micros - PG_EPOCH_US)
        if type_oid in (wire.OID_TEXT, wire.OID_NAME, wire.OID_VARCHAR):
            return str(value).encode("utf-8")
        raise ValueError(f"no binary encoder for oid {type_oid}")
    # text form
    if type_oid == wire.OID_BYTEA:
        return b"\\x" + bytes(value).hex().encode("ascii")
    if type_oid == wire.OID_BOOL:
        return b"t" if value else b"f"
    if type_oid in (wire.OID_TIMESTAMP, wire.OID_TIMESTAMPTZ):
        if isinstance(value, (int, np.integer)):
            value = datetime.datetime.fromtimestamp(
                value / 1_000_000, tz=datetime.timezone.utc
            )
        s = value.strftime("%Y-%m-%d %H:%M:%S.%f")
        if type_oid == wire.OID_TIMESTAMPTZ:
            s += "+00"
        return s.encode("ascii")
    return str(value).encode("utf-8")
