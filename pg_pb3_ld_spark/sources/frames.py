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


# the EXACT output schema of the spark-sql-kafka source (key/value/
# topic/partition/offset/timestamp/timestampType/headers) — recorded
# topics use it verbatim so the projection and resume logic run
# against the real record shape without a broker
KAFKA_RECORD_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int, "
    "headers array<struct<key: string, value: binary>>"
)


def write_kafka_recording(
    frames: list[tuple[int, int, bytes]],
    path: str,
    topic: str = "pb3ld",
    partition: int = 0,
) -> None:
    """Persist (frame_seq, lsn, frame) triples as a RECORDED Kafka
    topic: parquet rows in ``KAFKA_RECORD_DDL`` — ``offset`` :=
    frame_seq (dense within the partition, exactly what a
    one-partition-per-slot relay produces), LSN as an 8-byte
    big-endian ``'lsn'`` header, key = big-endian frame_seq,
    timestamp = LSN as epoch micros (deterministic)."""
    import struct as _struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    hdr_t = pa.list_(
        pa.struct([("key", pa.utf8()), ("value", pa.binary())])
    )
    tbl = pa.table(
        {
            "key": pa.array(
                [_struct.pack(">q", f[0]) for f in frames], pa.binary()
            ),
            "value": pa.array([f[2] for f in frames], pa.binary()),
            "topic": pa.array([topic] * len(frames), pa.utf8()),
            "partition": pa.array([partition] * len(frames), pa.int32()),
            "offset": pa.array([f[0] for f in frames], pa.int64()),
            "timestamp": pa.array(
                [f[1] for f in frames], pa.timestamp("us")
            ),
            "timestampType": pa.array([0] * len(frames), pa.int32()),
            "headers": pa.array(
                [
                    [
                        {"key": "lsn", "value": _struct.pack(">q", f[1])},
                    ]
                    for f in frames
                ],
                hdr_t,
            ),
        }
    )
    pq.write_table(tbl, path)


def recorded_kafka_frames(
    spark: SparkSession,
    path: str,
    starting_offsets: dict[int, int],
    max_records: int | None = None,
) -> DataFrame:
    """Replay a recorded topic the way the Kafka batch source delivers
    it for ``startingOffsets = {partition: next_offset}``: rows with
    ``offset >= next_offset`` per partition, optionally capped like
    ``maxOffsetsPerTrigger``, then the standard projection.

    The RESUME CONTRACT this exists to test: the offset a consumer
    commits must be derived from the SINK's applied watermark
    (``store.hwm()[1] + 1``), not from what was delivered — a batch
    cut mid-transaction holds its uncommitted tail back, and a
    consumer that committed the delivered position would lose those
    frames across a rebalance.  See tests/test_kafka_resume.py."""
    df = spark.read.schema(KAFKA_RECORD_DDL).parquet(path)
    cond = None
    for p, off in starting_offsets.items():
        c = (F.col("partition") == p) & (F.col("offset") >= off)
        if max_records is not None:
            c = c & (F.col("offset") < off + max_records)
        cond = c if cond is None else (cond | c)
    if cond is not None:
        df = df.where(cond)
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
