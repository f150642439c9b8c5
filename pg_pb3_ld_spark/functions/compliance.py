"""Compliance operators over the CDC-ingested corpus: keyed
pseudonymization and subject erasure ("right to be forgotten").

A 100-TB training corpus built from live conversation streams has two
standing legal obligations the pipeline itself must discharge:

* **Pseudonymization** — replace subject identifiers with stable
  opaque tokens BEFORE the corpus fans out to training shards, while
  preserving referential integrity (the same subject maps to the same
  token in every column, every table, every engine).
* **Erasure** — given an out-of-band deletion request (a list of
  subject keys, NOT a CDC delete arriving in the stream), remove every
  live row of those subjects from the snapshot store through the SAME
  exactly-once merge path normal changes take, so the watermark,
  lineage, changelog and downstream incremental consumers all observe
  the erasure as one ordinary atomic commit — and report which export
  shards are invalidated and must be rebuilt.

Reference parity note: the reference engine (decoder/pg_pb3_ld.c)
emits the change stream and leaves retention/erasure to downstream
consumers; these operators are that downstream contract, expressed
over the engine's own snapshot store.

Scale shape: pseudonymization is a pure codegen projection (no
shuffle, no Python).  Erasure is one bucket-pruned store read
filtered by a broadcast-able subject list + one ordinary COW merge of
DELETE rows — the touched data is proportional to the subjects' live
rows, never a full-table rewrite beyond their buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pseudonym_token(col: Column, secret: str, prefix: str = "subj") -> Column:
    """Stable keyed token for a subject identifier: ``prefix_`` +
    first 12 md5 hex chars of ``secret|value``.

    Portable by construction (md5 over a UTF-8 string is identical in
    Spark, DuckDB, and any engine a consumer audits with), and
    deterministic so referential integrity survives across columns,
    tables and cluster sizes.  NULL stays NULL.

    Disclosed honestly: this is a keyed hash, not RFC-2104 HMAC —
    md5's length-extension quirk is irrelevant here (fixed-position
    secret prefix, attacker never sees raw digests, 48-bit truncated
    output), but anyone needing cryptographic-grade unlinkability
    should swap in a real HMAC via the same Column contract."""
    return F.concat(
        F.lit(prefix + "_"),
        F.substring(
            F.md5(F.concat(F.lit(secret), F.lit("|"), col.cast("string"))),
            1,
            12,
        ),
    )


def pseudonymize(
    df: DataFrame,
    subject_col: str,
    secret: str,
    text_cols: tuple[str, ...] = (),
    prefix: str = "subj",
) -> DataFrame:
    """Replace ``subject_col`` with its keyed token and scrub every
    EXACT occurrence of the subject value inside ``text_cols`` (same
    token, so prose mentions stay linkable to the tokenized column).

    One codegen projection: no shuffle, no Python, no UDF.  The text
    scrub is a literal (non-regex) per-row replace of that row's OWN
    subject value — cross-row mention scrubbing is a different
    (join-shaped) problem; compose with ``pii_scrub`` for pattern-
    class redaction."""
    token = pseudonym_token(F.col(subject_col), secret, prefix)
    out = df.withColumn("__tok", token)
    for tc in text_cols:
        # NULL subject: replace(text, NULL, _) would null the text —
        # pass it through untouched instead
        out = out.withColumn(
            tc,
            F.when(
                F.col(subject_col).isNull(), F.col(tc)
            ).otherwise(
                F.replace(F.col(tc), F.col(subject_col), F.col("__tok"))
            ),
        )
    return out.withColumn(subject_col, F.col("__tok")).drop("__tok")


def subject_erasure_batch(
    store, subjects: DataFrame, subject_col: str = "conv_id"
) -> DataFrame:
    """Folded DELETE batch covering EVERY live key of the given
    subjects, stamped one LSN past the store's high watermark.

    The subjects list is an out-of-band request (ids only); the keys
    to delete are discovered from the store's own resolved state, so
    partially-deleted or never-seen subjects are handled (no rows →
    nothing to merge).  The batch speaks the store's normal folded
    schema, so applying it is an ordinary ``store.merge`` — atomic,
    watermark-advancing, changelog-visible, crash-safe."""
    schema = store.schema
    keys = [c.name for c in schema.key_columns]
    hwm_lsn, _hwm_seq = store.hwm()
    subj = subjects.select(
        F.col(subject_col).cast("string").alias(keys[0])
    ).distinct()
    live = store.read_table().join(F.broadcast(subj), keys[0])
    cols = [F.col(k) for k in keys]
    cols.append(F.lit("DELETE").alias("kind"))
    for c in schema.value_columns:
        cols.append(F.lit(None).cast(c.spark_type).alias(c.name))
        cols.append(F.lit(False).alias(f"{c.name}_set"))
    cols.append(F.lit(hwm_lsn + 1).cast("long").alias("last_lsn"))
    cols.append(F.lit(hwm_lsn + 1).cast("long").alias("last_frame_seq"))
    cols.append(F.lit(1).cast("long").alias("n_changes"))
    return live.select(*cols)


def erase_subjects(
    store,
    subjects: DataFrame,
    subject_col: str = "conv_id",
    batch_id: int | None = None,
) -> dict:
    """Apply an erasure request end-to-end: synthesize the DELETE
    batch from the store's live state and merge it.  Returns the
    merge metrics dict (``skipped: True`` when the subjects have no
    live rows — erasure is idempotent)."""
    batch = subject_erasure_batch(store, subjects, subject_col)
    return store.merge(batch, batch_id=batch_id)


def shard_invalidation(
    purged: DataFrame,
    remaining: DataFrame,
    key_col: str,
    n_shards: int,
) -> DataFrame:
    """Per-export-shard erasure report: which shards of a sharded
    corpus export lost rows (must be rebuilt + re-certified) and what
    remains in each.

    ``purged`` = the erased live rows (pre-erasure state of the
    subjects); ``remaining`` = the post-erasure table.  Shard
    placement reuses :func:`layout.shard_key`'s portable md5
    assignment, so the report is engine-replayable.  Two map-side-
    combining hash aggs + one full-outer equi join on the tiny
    (≤ n_shards) aggregate — no payload shuffle."""
    from pg_pb3_ld_spark.functions.layout import shard_key

    def _agg(df: DataFrame, n_pre: str, c_pre: str) -> DataFrame:
        return (
            df.select(
                shard_key(F.col(key_col), n_shards).alias("shard"),
                F.col(key_col).alias("_k"),
            )
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias(n_pre),
                F.countDistinct("_k").alias(c_pre),
            )
        )

    p = _agg(purged, "n_purged_rows", "n_purged_convs")
    r = _agg(remaining, "n_remaining_rows", "n_remaining_convs")
    return (
        p.join(r, "shard", "full_outer")
        .select(
            "shard",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in (
                    "n_purged_rows",
                    "n_purged_convs",
                    "n_remaining_rows",
                    "n_remaining_convs",
                )
            ],
        )
    )
