"""Wire-format constants shared by encoder and decoder.

All values transcribed from the reference's proto definition
(``pg_pb3.proto:7-54``) and C constants (``decoder/pg_pb3_ld.c:15-59``,
``decoder/utils.c:10-11``).
"""

# WireMessageType — pg_pb3.proto:7-13
WMSG_BEGIN = 0
WMSG_COMMIT = 1
WMSG_INSERT = 2
WMSG_UPDATE = 3
WMSG_DELETE = 4

WMSG_NAMES = {
    WMSG_BEGIN: "BEGIN",
    WMSG_COMMIT: "COMMIT",
    WMSG_INSERT: "INSERT",
    WMSG_UPDATE: "UPDATE",
    WMSG_DELETE: "DELETE",
}

# WireMessageHeader fields — pg_pb3.proto:15-18
WHDR_TYPES = 1
WHDR_OFFSETS = 2

# InsertDescription — pg_pb3.proto:26-29
INS_TABLE_DESC = 1
INS_NEW_VALUES = 3

# UpdateDescription — pg_pb3.proto:31-35
UPD_TABLE_DESC = 1
UPD_KEY_FIELDS = 3
UPD_NEW_VALUES = 5

# DeleteDescription — pg_pb3.proto:37-40
DEL_TABLE_DESC = 1
DEL_KEY_FIELDS = 3

# TableDescription — pg_pb3.proto:42-46
TD_SCHEMANAME = 1
TD_TABLENAME = 2
TD_TABLEOID = 3

# FieldSetDescription — pg_pb3.proto:48-54
FSD_NAMES = 2
FSD_VALUES = 3
FSD_TYPE_OIDS = 4
FSD_NULLS = 5
FSD_FORMATS = 6

# protobuf wire types
WIRE_VARINT = 0
WIRE_LEN = 2

# Engine-wide bound on messages per frame.  The fold packs WAL order
# into one long as (frame_seq << SHIFT | offset_idx), so offset_idx
# must fit in SHIFT bits; the encoder force-flushes at the cap and the
# decoder rejects frames that exceed it (fail fast instead of silent
# ordering corruption when wire_message_target_size is raised).
MAX_FRAME_MESSAGES_SHIFT = 20
MAX_FRAME_MESSAGES = 1 << MAX_FRAME_MESSAGES_SHIFT

# Common PostgreSQL type OIDs (pg_type.dat; exercised by the
# reference's tests — tests/common.go:20, tests/fuzzer/fuzzer.go:27-102)
OID_BOOL = 16
OID_BYTEA = 17
OID_NAME = 19
OID_INT8 = 20
OID_INT2 = 21
OID_INT4 = 23
OID_TEXT = 25
OID_FLOAT4 = 700
OID_FLOAT8 = 701
OID_VARCHAR = 1043
OID_TIMESTAMP = 1114
OID_TIMESTAMPTZ = 1184
