"""pb3 — the pg_pb3_ld wire codec.

``wire`` holds the shared constants (message kinds, field numbers),
``encoder`` is a pure-Python producer byte-compatible with the
reference's hand-rolled serializer (``decoder/protobuf.c`` +
``decoder/fsd.c``), used to synthesize deterministic test/bench
streams; ``decoder`` is the numpy-vectorized consumer that turns
batches of framed bytes into columnar change records.
"""

from pg_pb3_ld_spark.pb3 import wire
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
from pg_pb3_ld_spark.pb3.decoder import decode_frames

__all__ = [
    "wire",
    "FieldValue",
    "WireBatcher",
    "encode_varint",
    "encode_table",
    "encode_field_set",
    "encode_insert",
    "encode_update",
    "encode_delete",
    "decode_frames",
]
