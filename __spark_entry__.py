"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end CDC apply (encode →
decode → fold → MERGE) on a small deterministic stream and returns
the final transcripts table.  ``queries()`` exposes each implemented
operator from SURVEY.md §2 as a (spark, sf_dir) → DataFrame callable
over the driver's testdata tables, with ``oracle_sql()`` giving the
DuckDB-equivalent SQL.  Column names/aliases match pairwise so the
driver's order-insensitive value-hash comparison holds.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


# --------------------------------------------------------------------------
# flagship: full CDC apply pipeline
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay a deterministic pg_pb3_ld change stream into
    the transcripts table and return the final state (D1-D7 e2e)."""
    from pg_pb3_ld_spark.generator import generate_stream, write_frames_parquet
    from pg_pb3_ld_spark.pipeline import IngestPipeline
    from pg_pb3_ld_spark.schema import transcripts_schema
    from pg_pb3_ld_spark.sinks.store import SnapshotStore
    from pg_pb3_ld_spark.config import EngineConfig

    workdir = tempfile.mkdtemp(prefix="pb3ld_entry_")
    stream = generate_stream(seed=42, n_convs=12, max_turns=8, n_extra_txns=40)
    frames_path = os.path.join(workdir, "frames.parquet")
    write_frames_parquet(stream, frames_path)
    store = SnapshotStore.create(
        spark, os.path.join(workdir, "table"), transcripts_schema(), num_buckets=8
    )
    cfg = EngineConfig(
        type_oids_mode="omit_nulls", formats_mode="disabled",
        binary_oid_ranges="20-23,1184",
    )
    IngestPipeline(spark, store, cfg).apply_frames(
        spark.read.parquet(frames_path), batch_id=1
    )
    out = (
        store.read_table()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    # materialize before the tempdir vanishes
    rows = out.collect()
    shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# --------------------------------------------------------------------------
# driver-contract operator queries over /root/testdata tables
# --------------------------------------------------------------------------

def _us(col) -> F.Column:
    """Epoch microseconds of a (NTZ) timestamp — session tz is UTC,
    matching DuckDB's epoch_us on naive timestamps."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def q_dedup_last_wins(spark, sf_dir):
    """D4/T3 — last-write-wins per key: latest event per user in
    (ts, event_id) order (row_number desc = the fold's max-ord)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
            _us("ts").alias("last_ts_us"),
        )
    )


def q_txn_assembly(spark, sf_dir):
    """D3/T1 — ordered per-group assembly: each user's events as an
    ordered id chain (the txn-assembly ordering invariant)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id"))
                    ),
                    lambda x: x["event_id"].cast("string"),
                ),
                ",",
            ).alias("event_chain"),
        )
    )


def q_ordered_replay(spark, sf_dir):
    """T3/D6 — bit-for-bit replay determinism: md5 over the ordered
    event chain per user; any ordering instability changes the hash."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("ts", "event_id"))),
                        lambda x: x["event_id"].cast("string"),
                    ),
                    ",",
                )
            ).alias("replay_sig"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_watermark_filter(spark, sf_dir):
    """T4/D6 — LSN high-watermark analog: only events above the
    watermark (max ts − 3 days) pass; counts per type."""
    ev = _events(spark, sf_dir)
    return (
        ev.join(
            ev.agg(
                (F.max("ts") - F.expr("INTERVAL 3 DAYS")).alias("hwm")
            )
        )
        .where(F.col("ts") > F.col("hwm"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


def q_merge_upsert_effect(spark, sf_dir):
    """D5 — MERGE effect: snapshot (events ≤ cutoff) merged with
    changes (events > cutoff); error-typed last change = DELETE."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    last = (
        ev.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    )
    cutoff = ev.agg(
        F.floor(F.max("event_id") / 2).cast("long").alias("c")
    )
    return (
        last.join(cutoff)
        .where(~((F.col("event_type") == "error") & (F.col("event_id") > F.col("c"))))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.round("value", 4).alias("final_value"),
            (F.col("event_id") > F.col("c")).alias("was_changed"),
        )
    )


def q_partial_update_coalesce(spark, sf_dir):
    """D5/P5 — TOAST-omission fold: latest *present* (non-null) props
    per user; users with no present value drop out (absent ≠ NULL)."""
    ev = _events(spark, sf_dir).where(F.col("props").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", F.col("props").alias("last_props"))
    )


def q_key_extraction(spark, sf_dir):
    """P4 — replica-identity key projection: key stats per user."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        _us(F.min("ts")).alias("first_us"),
        _us(F.max("ts")).alias("last_us"),
        F.countDistinct("event_type").alias("n_types"),
    )


def q_change_type_dispatch(spark, sf_dir):
    """P1 — change-type dispatch: route event kinds to I/U/D ops."""
    ev = _events(spark, sf_dir)
    op = (
        F.when(F.col("event_type") == "click", "INSERT")
        .when(F.col("event_type") == "error", "DELETE")
        .otherwise("UPDATE")
    )
    return (
        ev.select(op.alias("op"), "value")
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_empty_txn_suppression(spark, sf_dir):
    """P7 — empty-transaction suppression: groups yielding no rows
    after the filter emit nothing (HAVING-gated)."""
    ev = _events(spark, sf_dir)
    return (
        ev.where(F.col("value") > 15.0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .where(F.col("n_kept") > 10)
    )


def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup (training-data op): md5-hash groups over document
    text; keep canonical min doc_id, count duplicates."""
    docs = _documents(spark, sf_dir)
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") >= 1)
    )


def q_doc_token_stats(spark, sf_dir):
    """Text analysis: token counts + quality ratio per document."""
    docs = _documents(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 4
        ).alias("ttr"),
        F.length("text").alias("n_chars_actual"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_last_wins": q_dedup_last_wins,
    "txn_assembly": q_txn_assembly,
    "ordered_replay": q_ordered_replay,
    "watermark_filter": q_watermark_filter,
    "merge_upsert_effect": q_merge_upsert_effect,
    "partial_update_coalesce": q_partial_update_coalesce,
    "key_extraction": q_key_extraction,
    "change_type_dispatch": q_change_type_dispatch,
    "empty_txn_suppression": q_empty_txn_suppression,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_stats": q_doc_token_stats,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_last_wins": """
            SELECT user_id,
                   event_id AS last_event_id,
                   event_type AS last_event_type,
                   round(value, 4) AS last_value,
                   epoch_us(ts) AS last_ts_us
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn FROM events
            ) WHERE rn = 1
        """,
        "txn_assembly": """
            SELECT user_id,
                   count(*) AS n_events,
                   string_agg(CAST(event_id AS VARCHAR), ','
                              ORDER BY ts, event_id) AS event_chain
            FROM events GROUP BY user_id
        """,
        "ordered_replay": """
            SELECT user_id,
                   md5(string_agg(CAST(event_id AS VARCHAR), ','
                                  ORDER BY ts, event_id)) AS replay_sig,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "watermark_filter": """
            SELECT event_type, count(*) AS n_above
            FROM events
            WHERE ts > (SELECT max(ts) - INTERVAL 3 DAY FROM events)
            GROUP BY event_type
        """,
        "merge_upsert_effect": """
            WITH c AS (
                SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS c
                FROM events
            ), last AS (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY event_id DESC
                ) AS rn FROM events
            )
            SELECT user_id,
                   event_id AS last_event_id,
                   round(value, 4) AS final_value,
                   event_id > (SELECT c FROM c) AS was_changed
            FROM last
            WHERE rn = 1
              AND NOT (event_type = 'error'
                       AND event_id > (SELECT c FROM c))
        """,
        "partial_update_coalesce": """
            SELECT user_id, props AS last_props
            FROM (
                SELECT user_id, props, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn FROM events WHERE props IS NOT NULL
            ) WHERE rn = 1
        """,
        "key_extraction": """
            SELECT user_id,
                   count(*) AS n,
                   epoch_us(min(ts)) AS first_us,
                   epoch_us(max(ts)) AS last_us,
                   count(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id
        """,
        "change_type_dispatch": """
            SELECT CASE WHEN event_type = 'click' THEN 'INSERT'
                        WHEN event_type = 'error' THEN 'DELETE'
                        ELSE 'UPDATE' END AS op,
                   count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "empty_txn_suppression": """
            SELECT event_type, count(*) AS n_kept
            FROM events WHERE value > 15.0
            GROUP BY event_type HAVING count(*) > 10
        """,
        "doc_exact_dedup": """
            SELECT md5(text) AS text_hash,
                   min(doc_id) AS canonical_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1 HAVING count(*) >= 1
        """,
        "doc_token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))
                       AS n_distinct_tokens,
                   round(len(list_distinct(string_split(text, ' ')))
                         / CAST(len(string_split(text, ' ')) AS DOUBLE), 4)
                       AS ttr,
                   length(text) AS n_chars_actual
            FROM documents
        """,
    }
