"""Temporal join operators Spark lacks natively.

``asof_join`` — join each left row to the most recent right row per
key (strictly before, or inclusive at equal timestamps).  The naive
formulation is a per-row range probe (O(n·m) nested loop, or a
window over a range-joined blowup); this one is the scalable
union-and-forward-fill plan:

1. tag both inputs and UNION them (schema-aligned via null structs);
2. ONE hash exchange on the join keys, ONE sort by (ts, tag,
   tiebreak) — at equal timestamps the tag decides strict vs
   inclusive visibility;
3. ``last(right_struct, ignorenulls=True)`` over rows-unbounded-
   preceding forward-fills the latest right row into every left row.

Cost is a single shuffle+sort of |L|+|R| rows regardless of match
fan-in — the same shape DuckDB/kdb execute ASOF JOIN with, expressed
in Catalyst window algebra.  Skewed keys split like any windowed
key (AQE on the shuffle; the window key is the partition key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
    inclusive: bool = False,
    payload: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row of the same
    ``on`` key with ``right.ts < left.ts`` (``<=`` when
    ``inclusive``); unmatched left rows keep NULL payload columns.

    ``payload``: right columns to attach (default: all non-key,
    non-ts columns), returned under their own names plus
    ``<ts_col>_right`` — they must not collide with left columns.
    ``tiebreak``: right column ordering concurrent right rows (the
    greatest wins); defaults to ``ts_col``.
    """
    payload = payload or [
        c for c in right.columns if c not in (*on, ts_col)
    ]
    tiebreak = tiebreak or ts_col
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload collides with left columns: {clash}")

    r_struct = F.struct(
        *[F.col(c) for c in payload],
        F.col(ts_col).alias(f"{ts_col}_right"),
        F.col(tiebreak).alias("_tb"),
    )
    r2 = right.select(
        *on, F.col(ts_col).alias("_ts"), r_struct.alias("_r")
    )
    r_type = r2.schema["_r"].dataType
    l2 = left.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    l_type = l2.schema["_l"].dataType

    # strict: left sorts BEFORE an equal-ts right row (cannot see it);
    # inclusive: after (sees it)
    l_tag, r_tag = (1, 0) if inclusive else (0, 1)
    u = l2.select(
        *on, "_ts", F.lit(l_tag).alias("_tag"), "_l",
        F.lit(None).cast(r_type).alias("_r"),
    ).unionByName(
        r2.select(
            *on, "_ts", F.lit(r_tag).alias("_tag"),
            F.lit(None).cast(l_type).alias("_l"), "_r",
        )
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_tag").asc(),
            F.col("_r._tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("_r", ignorenulls=True).over(w)
    out_cols: list[Column] = [F.col("_l.*")]
    for c in payload:
        out_cols.append(F.col("_m").getField(c).alias(c))
    out_cols.append(
        F.col("_m").getField(f"{ts_col}_right").alias(f"{ts_col}_right")
    )
    return (
        u.withColumn("_m", m)
        .where(F.col("_l").isNotNull())
        .select(*out_cols)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join (``start <= ts <= end``, inclusive)
    without a nested-loop range probe: both sides are binned to
    ``bucket_width`` buckets of the time axis — each interval
    explodes into the buckets it covers, each point maps to exactly
    ONE bucket — then an ordinary equi-join on (keys…, bucket) plus
    the residual range filter.  A point meets each covering interval
    in exactly one bucket (its own), so no dedup is needed.

    Shuffle volume is |P| + Σ(interval_len/bucket_width + 1): pick
    ``bucket_width`` near the typical interval length (explode factor
    ~2).  This is the plan Spark's optimizer cannot derive from a
    BETWEEN predicate (it falls back to broadcast-nested-loop);
    binning turns it into a hash join that scales on both sides."""
    on = list(on or [])
    w = int(bucket_width)
    p = points.withColumn(
        "_b", F.floor(F.col(ts_col) / w).cast("long")
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    return (
        p.join(i, on=on + ["_b"], how="inner")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )
