"""Type-2 slowly-changing-dimension (SCD2) history from the change
feed.

The reference's consumers keep only the latest row per key (the
MERGE-upsert semantics of `/root/reference/decoder/pg_pb3_ld.c`
UPDATE/DELETE messages); warehouse consumers routinely want the other
classic CDC sink mode too: FULL HISTORY, one row per version of each
key with a validity interval, so any past state is a range predicate
away.  This module derives that history from the store's change data
feed (`SnapshotStore.read_changes`) instead of re-scanning snapshots
— O(feed), not O(table × snapshots).

Granularity is per-commit (the feed resolves each micro-batch's
intra-batch churn to one row per key per commit — same as building
SCD2 off Delta CDF / Iceberg changelogs); that is disclosed, not
hidden: within-batch intermediate states never existed in the store
and therefore have no version row.

Scale shape: ONE hash shuffle on the key plus a per-key window whose
partition size is the number of COMMITS that touched the key (bounded
by micro-batch count, never by event count) — at 10^10 events the
window input is the feed, already orders of magnitude smaller than
the stream, and no global sort exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    lsn_col: str = "last_lsn",
    snap_col: str = "snapshot_id",
) -> DataFrame:
    """Build the SCD2 version relation from a change feed.

    ``changes`` must carry one row per (key, commit) with
    ``change_type`` ∈ INSERT/UPDATE/DELETE and post-image value
    columns (exactly ``SnapshotStore.read_changes`` output; MoR
    UPSERT feeds must be compacted to exact classification first).

    Every INSERT/UPDATE opens a version valid from its commit LSN;
    the key's NEXT change of any type (including DELETE) closes it.
    DELETE rows open nothing — a deleted key simply has no current
    version until re-inserted.  Output per version:

    key…, value…, valid_from_lsn, valid_from_snap, valid_to_lsn,
    valid_to_snap (both NULL while current), is_current.

    Invariants (pinned by tests): per-key intervals are disjoint and
    ordered; a key has ≤1 current version; the set of current
    versions equals the live table; state *as of* snapshot S is the
    versions with valid_from_snap ≤ S < coalesce(valid_to_snap, ∞).
    """
    w = Window.partitionBy(*key_cols).orderBy(snap_col, lsn_col)
    seq = changes.select(
        *key_cols, "change_type", *value_cols, lsn_col, snap_col
    ).select(
        "*",
        F.lead(lsn_col).over(w).alias("_to_lsn"),
        F.lead(snap_col).over(w).alias("_to_snap"),
    )
    return seq.where(F.col("change_type") != "DELETE").select(
        *key_cols,
        *value_cols,
        F.col(lsn_col).cast("long").alias("valid_from_lsn"),
        F.col(snap_col).cast("long").alias("valid_from_snap"),
        F.col("_to_lsn").cast("long").alias("valid_to_lsn"),
        F.col("_to_snap").cast("long").alias("valid_to_snap"),
        F.col("_to_lsn").isNull().alias("is_current"),
    )


def scd2_as_of(
    history: DataFrame, snapshot_id: int, snap_col: str = "snapshot_id"
) -> DataFrame:
    """Point-in-time read over an SCD2 relation: the rows live as of
    (immediately after) commit ``snapshot_id`` — a pure range filter,
    no join, no window."""
    return history.where(
        (F.col("valid_from_snap") <= F.lit(snapshot_id))
        & (
            F.col("valid_to_snap").isNull()
            | (F.col("valid_to_snap") > F.lit(snapshot_id))
        )
    )
