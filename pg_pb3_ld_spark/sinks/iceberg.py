"""Iceberg sink — the production MERGE path (D5/D6/D7).

When an Iceberg catalog is on the classpath/session
(``--packages org.apache.iceberg:iceberg-spark-runtime-…`` +
``spark.sql.catalog.<name>`` configs), the engine applies folded
change batches with a real ``MERGE INTO``; the bundled
``SnapshotStore`` is the sandbox stand-in with identical semantics
(COW over ``bucket(N, conv_id)``, snapshot-atomic watermark).

The SQL generation lives here and is unit-tested without the runtime
jar; ``IcebergSink.available()`` gates actual execution.

Semantics mirrored from the fold's row kinds:

* ``DELETE``  → ``WHEN MATCHED AND s.kind = 'DELETE' THEN DELETE``
* ``REPLACE`` → full-row ``UPDATE SET`` (absent-since-barrier columns
  become NULL — the INSERT rebuilt the row)
* ``PATCH``   → per-column ``CASE WHEN s.<c>_set THEN s.<c> ELSE t.<c>``
  (TOAST omission: absent ≠ NULL, ``decoder/fsd.c:163-175``)
* missing target row (and not DELETE) → ``WHEN NOT MATCHED INSERT``

Exactly-once: the LSN high-watermark rides the Iceberg snapshot as
summary properties (``snapshot-property.`` write options), so data +
watermark commit in one snapshot, same as the sandbox store's
manifest pointer swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_pb3_ld_spark.schema import TargetSchema


def merge_sql(
    schema: TargetSchema, target: str, source_view: str = "_changes"
) -> str:
    """Build the MERGE INTO statement for one folded change batch."""
    keys = [c.name for c in schema.key_columns]
    vals = [c.name for c in schema.value_columns]
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    patch_sets = ", ".join(
        f"t.{c} = CASE WHEN s.kind = 'REPLACE' OR s.{c}_set "
        f"THEN s.{c} ELSE t.{c} END"
        for c in vals
    )
    insert_cols = ", ".join(keys + vals)
    insert_vals = ", ".join(f"s.{c}" for c in keys + vals)
    return (
        f"MERGE INTO {target} t\n"
        f"USING {source_view} s\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND s.kind = 'DELETE' THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET {patch_sets}\n"
        f"WHEN NOT MATCHED AND s.kind != 'DELETE' THEN "
        f"INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


def create_table_sql(schema: TargetSchema, target: str, buckets: int) -> str:
    """CREATE TABLE with Iceberg bucket partitioning on the first key
    (the input_hint's ``bucket(N, conv_id)`` layout)."""
    cols = ", ".join(f"{c.name} {c.spark_type}" for c in schema.columns)
    key0 = schema.key_columns[0].name
    return (
        f"CREATE TABLE IF NOT EXISTS {target} ({cols})\n"
        f"USING iceberg\n"
        f"PARTITIONED BY (bucket({buckets}, {key0}))\n"
        f"TBLPROPERTIES ('write.target-file-size-bytes'='134217728', "
        f"'format-version'='2')"
    )


def add_column_sql(target: str, name: str, spark_type: str) -> str:
    """Additive schema evolution (D7) — safe in Iceberg v2."""
    return f"ALTER TABLE {target} ADD COLUMN {name} {spark_type}"


def simulate_merge(
    target: DataFrame, folded: DataFrame, schema: TargetSchema
) -> DataFrame:
    """Executable specification of ``merge_sql``'s WHEN clauses as a
    full-outer-join — clause-for-clause:

    * ``WHEN MATCHED AND s.kind = 'DELETE' THEN DELETE``
    * ``WHEN MATCHED THEN UPDATE SET t.c = CASE WHEN s.kind='REPLACE'
      OR s.c_set THEN s.c ELSE t.c END``
    * ``WHEN NOT MATCHED AND s.kind != 'DELETE' THEN INSERT``

    No Iceberg runtime ships in the sandbox, so this is what pins the
    generated MERGE's semantics executably: the differential test
    (tests/test_iceberg_differential.py) replays the same folded
    batches through ``SnapshotStore.merge`` and through chained
    ``simulate_merge`` calls and asserts identical final tables —
    incl. DELETE/REPLACE/PATCH and the evolved-column case.
    """
    from pyspark.sql import functions as F

    keys = [c.name for c in schema.key_columns]
    vals = [c.name for c in schema.value_columns]
    s = folded.alias("s")
    # "matched" = a target row existed: detect via a target-side
    # sentinel that survives the outer join regardless of data nulls
    t_marked = target.withColumn("_t_exists", F.lit(True)).alias("t")
    joined = t_marked.join(s, on=keys, how="full_outer")
    t_exists = F.coalesce(F.col("_t_exists"), F.lit(False))
    has_src = F.col("s.kind").isNotNull()
    is_del = F.col("s.kind") == "DELETE"
    keep = (
        (t_exists & ~has_src)                      # untouched target row
        | (t_exists & has_src & ~is_del)           # MATCHED non-DELETE
        | (~t_exists & has_src & ~is_del)          # NOT MATCHED INSERT
    )
    cols = [F.col(k) for k in keys]
    for c in vals:
        cols.append(
            F.when(~has_src, F.col(f"t.{c}"))
            .when(
                (F.col("s.kind") == "REPLACE") | F.col(f"s.{c}_set"),
                F.col(f"s.{c}"),
            )
            .when(t_exists, F.col(f"t.{c}"))
            .otherwise(F.lit(None))                # INSERT of absent col
            .alias(c)
        )
    return joined.where(keep).select(*cols)


class IcebergSink:
    """Thin executor around the SQL builders above."""

    def __init__(self, spark: SparkSession, target: str, buckets: int = 1024):
        self.spark = spark
        self.target = target
        self.buckets = buckets

    @staticmethod
    def available(spark: SparkSession) -> bool:
        # py4j returns a JavaPackage placeholder (no exception) for a
        # missing class — Class.forName is the reliable probe
        try:
            spark._jvm.java.lang.Class.forName(  # noqa: SLF001
                "org.apache.iceberg.Snapshot"
            )
            return True
        except Exception:
            return False

    def ensure_table(self, schema: TargetSchema) -> None:
        self.spark.sql(create_table_sql(schema, self.target, self.buckets))

    def evolve(self, schema: TargetSchema) -> None:
        existing = {
            f.name for f in self.spark.table(self.target).schema.fields
        }
        for c in schema.columns:
            if c.name not in existing:
                self.spark.sql(
                    add_column_sql(self.target, c.name, c.spark_type)
                )

    def merge(self, folded: DataFrame, schema: TargetSchema,
              hwm: tuple[int, int] | None = None) -> None:
        folded.createOrReplaceTempView("_changes")
        if hwm is not None:
            # ride the watermark on the snapshot (exactly-once commit)
            self.spark.conf.set(
                "spark.wap.snapshot-property.applied-lsn", str(hwm[0])
            )
            self.spark.conf.set(
                "spark.wap.snapshot-property.applied-frame", str(hwm[1])
            )
        self.spark.sql(merge_sql(schema, self.target))
