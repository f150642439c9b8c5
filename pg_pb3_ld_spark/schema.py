"""Target-table schema model.

The engine's sink is the BASELINE.json input_hint table::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

keyed ``(conv_id, turn_idx)``.  Schemas are *dynamic* in the wire
format — every message carries its own column names
(``pg_pb3.proto:48-54``; the reference's fuzzer generates 1-511-column
tables, ``tests/fuzzer/fuzzy.go:36-63``) — so ``TargetSchema`` is a
runtime value the store evolves additively (new wire field name →
new column), not a compile-time constant.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pg_pb3_ld_spark.pb3 import wire


@dataclass(frozen=True)
class TargetColumn:
    name: str
    type_oid: int
    spark_type: str          # Spark SQL DDL type string
    is_key: bool = False


@dataclass
class TargetSchema:
    table: str
    columns: list[TargetColumn]

    @property
    def key_columns(self) -> list[TargetColumn]:
        return [c for c in self.columns if c.is_key]

    @property
    def value_columns(self) -> list[TargetColumn]:
        return [c for c in self.columns if not c.is_key]

    def column(self, name: str) -> TargetColumn:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def with_column(self, col: TargetColumn) -> "TargetSchema":
        if any(c.name == col.name for c in self.columns):
            return self
        return TargetSchema(self.table, [*self.columns, col])

    def with_widened(self, col: TargetColumn) -> "TargetSchema":
        """Replace an existing column with its widened form (same
        name and key-ness, wider type + new wire oid)."""
        return TargetSchema(
            self.table,
            [
                TargetColumn(c.name, col.type_oid, col.spark_type, c.is_key)
                if c.name == col.name
                else c
                for c in self.columns
            ],
        )

    def ddl(self) -> str:
        return ", ".join(f"{c.name} {c.spark_type}" for c in self.columns)


# Safe type promotions (Iceberg's updateColumn rules): every value
# representable in the narrow type is exactly representable in the
# wide one, so widening never rewrites data — old snapshots cast
# losslessly on read.
WIDENINGS = {
    "smallint": ("int", "bigint"),
    "int": ("bigint",),
    "float": ("double",),
}


def can_widen(frm: str, to: str) -> bool:
    return to in WIDENINGS.get(frm, ())


# spark type ⇐ pg oid, for additive evolution of unseen wire columns
OID_TO_SPARK = {
    wire.OID_BOOL: "boolean",
    wire.OID_BYTEA: "binary",
    wire.OID_NAME: "string",
    wire.OID_INT2: "smallint",
    wire.OID_INT4: "int",
    wire.OID_INT8: "bigint",
    wire.OID_TEXT: "string",
    wire.OID_FLOAT4: "float",
    wire.OID_FLOAT8: "double",
    wire.OID_VARCHAR: "string",
    wire.OID_TIMESTAMP: "timestamp_ntz",
    wire.OID_TIMESTAMPTZ: "timestamp",
}


def union_schema(schemas: list[TargetSchema]) -> TargetSchema:
    """Column union (by name) across routed tables, for the ONE typed
    decode a multi-table apply shares (the reference stream interleaves
    every replica-identity table's messages —
    decoder/pg_pb3_ld.c:300-334 — and decoding once is the whole point
    of the single-pass plan).

    A column is a key in the union if it is a key in ANY table: key
    columns additionally read ``key_fields`` on the wire, and a table
    whose messages don't carry that name simply falls back to
    ``new_values`` — per-table semantics are preserved.  A name
    colliding with DIFFERENT types across tables cannot share one
    typed column and raises (route such tables through a separate
    pipeline)."""
    seen: dict[str, TargetColumn] = {}
    for s in schemas:
        for c in s.columns:
            prev = seen.get(c.name)
            if prev is None:
                seen[c.name] = c
                continue
            if (prev.spark_type, prev.type_oid) != (c.spark_type, c.type_oid):
                raise ValueError(
                    f"column {c.name!r} has conflicting types across "
                    f"routed tables ({prev.spark_type}/oid {prev.type_oid}"
                    f" vs {c.spark_type}/oid {c.type_oid}) — decode "
                    "these tables in separate pipelines"
                )
            if c.is_key and not prev.is_key:
                seen[c.name] = TargetColumn(
                    c.name, c.type_oid, c.spark_type, is_key=True
                )
    return TargetSchema("__union__", list(seen.values()))


def transcripts_schema() -> TargetSchema:
    return TargetSchema(
        "transcripts",
        [
            TargetColumn("conv_id", wire.OID_TEXT, "string", is_key=True),
            TargetColumn("turn_idx", wire.OID_INT4, "int", is_key=True),
            TargetColumn("role", wire.OID_TEXT, "string"),
            TargetColumn("text", wire.OID_TEXT, "string"),
            TargetColumn("tool", wire.OID_TEXT, "string"),
            TargetColumn("ts", wire.OID_TIMESTAMPTZ, "timestamp"),
        ],
    )
