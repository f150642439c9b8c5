"""Frame-stream sources (S6/S7 consumer transports).

The reference feeds consumers over two transports (SURVEY.md §3):
SQL-pull (``pg_logical_slot_get_binary_changes``) and streaming
replication (``START_REPLICATION`` COPY-BOTH, the fuzzer's path —
``tests/fuzzer/fuzzer.go:439-529``).  Spark-side, both reduce to "a
source of (frame_seq, lsn, frame) rows in LSN order":

* **parquet landing zone** (sandbox + cloud-storage deployments): a
  relay (e.g. a small Go/pg_recvlogical process) appends frame files;
  mtime/name order must follow LSN order — the pipeline's
  ``strict_frame_order`` guard enforces it at apply time;
* **Kafka** (production): one partition per slot keeps LSN order;
  ``value`` = frame bytes, LSN travels in headers or a key prefix.

Kafka needs the spark-sql-kafka package; ``kafka_frames`` builds the
reader when present and raises a pointed error when not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

FRAME_DDL = "frame_seq long, lsn long, frame binary"


def parquet_frames(
    spark: SparkSession, path: str, streaming: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Landing-zone source (batch or micro-batch streaming)."""
    if streaming:
        reader = spark.readStream.schema(FRAME_DDL)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(path)
    return spark.read.schema(FRAME_DDL).parquet(path)


def binaryfile_frames(
    spark: SparkSession, path: str, streaming: bool = False,
    name_pattern: str = r"frame-(\d+)-(\d+)\.bin$",
) -> DataFrame:
    """Raw-file landing zone: one wire frame per file, named
    ``frame-<seq>-<lsn>.bin`` (a pg_recvlogical-style relay writes
    exactly this).  Spark's ``binaryFile`` source reads (path,
    modificationTime, length, content); frame_seq and LSN parse out
    of the file name, so ordering survives any object-store listing
    order — the strict_frame_order guard still validates density.
    """
    reader = (
        (spark.readStream if streaming else spark.read)
        .format("binaryFile")
        .option("pathGlobFilter", "*.bin")
    )
    df = reader.load(path)
    return df.select(
        F.regexp_extract(F.col("path"), name_pattern, 1)
        .cast("long").alias("frame_seq"),
        F.regexp_extract(F.col("path"), name_pattern, 2)
        .cast("long").alias("lsn"),
        F.col("content").alias("frame"),
    )


def kafka_frames(
    spark: SparkSession, bootstrap: str, topic: str,
    starting_offsets: str = "earliest", streaming: bool = True,
) -> DataFrame:
    """Kafka source: key = 16-byte big-endian (frame_seq, lsn32) or
    headers ``lsn``/``frame_seq``; value = frame bytes.

    One topic partition per replication slot — Kafka only orders
    within a partition, and the LSN watermark requires order (same
    contract as the walsender socket the reference writes to).
    """
    try:
        reader = (
            (spark.readStream if streaming else spark.read)
            .format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        df = reader.load()
    except Exception as exc:  # pragma: no cover - no kafka in sandbox
        raise RuntimeError(
            "Kafka source needs --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from exc
    return project_kafka_records(df)


def project_kafka_records(df: DataFrame) -> DataFrame:
    """Kafka record shape → (frame_seq, lsn, frame).

    The kafka offset is a valid frame_seq (dense per partition); the
    LSN rides in the record headers as 8 big-endian bytes under key
    ``'lsn'`` when the relay provides it, else falls back to the
    offset (monotone ⇒ watermark-safe).  Factored out of
    ``kafka_frames`` so the projection is unit-testable without a
    broker (the reference's production transport analog,
    ``tests/fuzzer/fuzzer.go:439-529`` tracks WALStart per frame the
    same way).
    """
    # get(..., 0) is null-safe on an empty filter result — plain [0]
    # indexing raises invalidArrayIndexError under ANSI mode when the
    # record has headers but no 'lsn' key
    lsn_hdr = F.expr(
        "get(filter(headers, h -> h.key = 'lsn'), 0).value"
    )
    return df.select(
        F.col("offset").alias("frame_seq"),
        F.coalesce(
            F.conv(F.hex(lsn_hdr), 16, 10).cast("long"), F.col("offset")
        ).alias("lsn"),
        F.col("value").alias("frame"),
    )
