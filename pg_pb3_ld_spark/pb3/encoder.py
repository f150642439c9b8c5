"""Pure-Python pg_pb3_ld wire-format **encoder** (producer side).

Byte-compatible with the reference's hand-rolled protobuf serializer:
varints per ``pb3_append_int32``/``pb3_append_uint32``
(``decoder/protobuf.c:8-30``), field keys per
``pb3_append_var{int,len}_key`` (``protobuf.c:76-86``), field-set
layout per ``fsd_serialize`` (``decoder/fsd.c:229-301``: per column
name → value → optional type_oid, then the nulls byte-per-column
bitmap, then the optional formats bitmap), message layout per
``pb3ld_change`` (``decoder/pg_pb3_ld.c:338-411`` — note UPDATE writes
``new_values`` (field 5) *before* ``key_fields`` (field 3), which we
reproduce so goldens are byte-identical), and framing per
``pb3ld_flush_message_buffer`` (``decoder/utils.c:184-189``:
``varint(header_len) ++ header ++ body``).

This is only used to *synthesize* deterministic streams for tests and
benchmarks — in production the producer is the reference plugin
itself.  Speed matters for bench-stream generation, so the hot helpers
avoid per-call allocation where easy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pg_pb3_ld_spark.config import EngineConfig, MODE_DISABLED, MODE_FULL, MODE_OMIT_NULLS
from pg_pb3_ld_spark.pb3 import wire


def encode_varint(value: int) -> bytes:
    """Unsigned LEB128 — decoder/protobuf.c:8-30."""
    if value < 0:
        raise ValueError("pg_pb3_ld varints are unsigned")
    out = bytearray()
    while value > 127:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    out.append(value)
    return bytes(out)


def _varint_key(field_number: int) -> bytes:
    return encode_varint((field_number << 3) | wire.WIRE_VARINT)


def _varlen_key(field_number: int) -> bytes:
    return encode_varint((field_number << 3) | wire.WIRE_LEN)


def append_varint_kv(buf: bytearray, field_number: int, value: int) -> None:
    buf += _varint_key(field_number)
    buf += encode_varint(value)


def append_bytes_kv(buf: bytearray, field_number: int, data: bytes) -> None:
    buf += _varlen_key(field_number)
    buf += encode_varint(len(data))
    buf += data


@dataclass(frozen=True)
class FieldValue:
    """One column of a field set (decoder/pg_pb3_ld.h:29-40 analog).

    ``value is None`` means SQL NULL (wire: empty bytes + null-bitmap
    flag, fsd.c:139-146); a column that is *omitted* entirely (TOAST
    semantics, fsd.c:163-175) simply doesn't appear in the list.
    """

    name: str
    value: bytes | None
    type_oid: int
    is_binary: bool = False


def encode_field_set(
    columns: list[FieldValue],
    type_oids_mode: str = MODE_DISABLED,
    formats_mode: str = MODE_DISABLED,
) -> bytes:
    """Serialize a FieldSetDescription *body* — decoder/fsd.c:229-301."""
    buf = bytearray()
    for col in columns:
        append_bytes_kv(buf, wire.FSD_NAMES, col.name.encode("utf-8"))
        if col.value is None:
            append_bytes_kv(buf, wire.FSD_VALUES, b"")
            # NULL columns carry an oid only in FULL mode (fsd.c:249-252)
            if type_oids_mode == MODE_FULL:
                append_varint_kv(buf, wire.FSD_TYPE_OIDS, col.type_oid)
        else:
            append_bytes_kv(buf, wire.FSD_VALUES, col.value)
            if type_oids_mode != MODE_DISABLED:
                append_varint_kv(buf, wire.FSD_TYPE_OIDS, col.type_oid)
    # nulls bitmap: always emitted, one byte per column (fsd.c:267-275)
    buf += _varlen_key(wire.FSD_NULLS)
    buf += encode_varint(len(columns))
    buf += bytes(1 if c.value is None else 0 for c in columns)
    # formats bitmap (fsd.c:277-294); NULL columns are text (fsd.c:145)
    if formats_mode != MODE_DISABLED:
        fmts = bytes(
            1 if (c.value is not None and c.is_binary) else 0
            for c in columns
            if not (formats_mode == MODE_OMIT_NULLS and c.value is None)
        )
        append_bytes_kv(buf, wire.FSD_FORMATS, fmts)
    return bytes(buf)


def encode_table(
    schema_name: str, table_name: str, table_oid: int | None = None
) -> bytes:
    """TableDescription *body* — decoder/pg_pb3_ld.c:274-293."""
    buf = bytearray()
    append_bytes_kv(buf, wire.TD_SCHEMANAME, schema_name.encode("utf-8"))
    append_bytes_kv(buf, wire.TD_TABLENAME, table_name.encode("utf-8"))
    if table_oid is not None:
        append_varint_kv(buf, wire.TD_TABLEOID, table_oid)
    return bytes(buf)


def _submessage(field_number: int, body: bytes) -> bytes:
    return _varlen_key(field_number) + encode_varint(len(body)) + body


def encode_insert(table_body: bytes, new_values_body: bytes) -> bytes:
    """InsertDescription — pg_pb3_ld.c:340-356."""
    return _submessage(wire.INS_TABLE_DESC, table_body) + _submessage(
        wire.INS_NEW_VALUES, new_values_body
    )


def encode_update(
    table_body: bytes, key_fields_body: bytes, new_values_body: bytes
) -> bytes:
    """UpdateDescription — pg_pb3_ld.c:357-387.

    Wire order matches the reference: table, then **new_values (5)**,
    then key_fields (3).
    """
    return (
        _submessage(wire.UPD_TABLE_DESC, table_body)
        + _submessage(wire.UPD_NEW_VALUES, new_values_body)
        + _submessage(wire.UPD_KEY_FIELDS, key_fields_body)
    )


def encode_delete(table_body: bytes, key_fields_body: bytes) -> bytes:
    """DeleteDescription — pg_pb3_ld.c:388-411."""
    return _submessage(wire.DEL_TABLE_DESC, table_body) + _submessage(
        wire.DEL_KEY_FIELDS, key_fields_body
    )


class WireBatcher:
    """Accumulates messages into frames — the consumer-facing inverse
    of ``pb3ld_wire_message_begin`` / ``pb3ld_flush_message_buffer``
    (``decoder/utils.c:161-213``).

    * one header entry (type + body offset) per message
      (utils.c:161-166);
    * flush when the body exceeds the 4 MiB target
      (pg_pb3_ld.c:96-97, utils.c:173-177) or at commit
      (pg_pb3_ld.c:266-271) — a frame never spans a commit;
    * frame bytes are ``varint(len(header)) ++ header ++ body``
      (utils.c:184-189);
    * empty transactions emit nothing (pg_pb3_ld.c:254-258).

    Emits ``(lsn, frame_bytes)`` tuples; LSN increases monotonically
    with the byte stream like WALStart does on the replication
    transport (tests/fuzzer/fuzzer.go:506-526).
    """

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()
        self._header = bytearray()
        self._body = bytearray()
        self._n_msgs = 0
        self._frames: list[tuple[int, bytes]] = []
        self._lsn = 1000  # arbitrary nonzero start, like a real WAL position
        self._in_txn = False
        self._sent_message_this_txn = False

    # -- message append (producer analog of pb3ld_wire_message_begin) --

    def _append(self, msgtype: int, body: bytes) -> None:
        append_varint_kv(self._header, wire.WHDR_TYPES, msgtype)
        append_varint_kv(self._header, wire.WHDR_OFFSETS, len(self._body))
        self._body += body
        self._n_msgs += 1
        # flush at the byte target (pg_pb3_ld.c:417-422) OR at the
        # message-count cap: the consumer packs offset_idx into
        # MAX_FRAME_MESSAGES_SHIFT bits of the WAL-order long, so a
        # frame must never carry more messages than that, regardless
        # of how large wire_message_target_size is configured
        if (
            len(self._body) > self.config.wire_message_target_size
            or self._n_msgs >= wire.MAX_FRAME_MESSAGES
        ):
            self._flush()

    def begin_txn(self) -> None:
        self._in_txn = True
        self._sent_message_this_txn = False
        if self.config.begin_messages:
            self._append(wire.WMSG_BEGIN, b"")

    def change(self, msgtype: int, body: bytes) -> None:
        if not self._in_txn:
            raise RuntimeError("change outside transaction")
        self._sent_message_this_txn = True
        self._append(msgtype, body)

    def commit_txn(self) -> None:
        # empty-transaction suppression — pg_pb3_ld.c:254-258: a txn
        # with no decoded changes (and no pending header) emits nothing
        if not self._sent_message_this_txn and not self._header:
            self._in_txn = False
            return
        if self.config.commit_messages:
            self._append(wire.WMSG_COMMIT, b"")
        if self._header:
            self._flush()
        self._in_txn = False

    def _flush(self) -> None:
        frame = (
            encode_varint(len(self._header))
            + bytes(self._header)
            + bytes(self._body)
        )
        self._frames.append((self._lsn, frame))
        self._lsn += len(frame) + 1  # fuzzer.go:526 LSN advance idiom
        self._header.clear()
        self._body.clear()
        self._n_msgs = 0

    def cut(self) -> None:
        """Simulate a producer cut mid-transaction (walsender crash /
        stream truncation before COMMIT): flush whatever is buffered
        WITHOUT a commit marker.  The consumer's commit gate must hold
        these changes back; ungated monitoring views (streaming
        sessions) see them at-least-once — this is the fixture for
        pinning both behaviors."""
        if self._header:
            self._flush()
        self._in_txn = False

    def frames(self) -> list[tuple[int, bytes]]:
        if self._in_txn:
            raise RuntimeError("frames() inside an open transaction")
        return list(self._frames)
