"""Deterministic, mergeable sketch operators.

Cardinality and sampling at 100 TB can't collect raw values; they
need fixed-size state that (a) merges associatively so map-side
combine does the heavy lifting, and (b) is DETERMINISTIC so results
are reproducible across retries/partitionings and replayable by an
external oracle.  Both operators here hash with md5 (portable — the
same convention the store's md5 bucket function established) and
keep all mergeable state in EXACT integer arithmetic (a float sum's
value depends on partition order; a bigint sum's doesn't), so DuckDB
reproduces every output bit.

* ``distinct_sketch`` — a k-bucket minimum-hash cardinality
  estimator (KMV/PCSA-style stochastic averaging): each value hashes
  to one of k buckets; per (group, bucket) keep the MINIMUM 48-bit
  hash — a plain ``min()`` HashAggregate, mergeable and map-side
  combined, state = k bigints per group, never a distinct-shuffle of
  raw values.  With n_i uniform draws in a bucket, E[min_norm] ≈
  1/(n_i+1), so Σ over buckets ≈ k²/(n+k) and n̂ = k²/Σ_norm − k;
  In the sparse regime (n ≲ k) that estimator reads ~n/2 (a bucket
  with ONE draw has E[min] = 1/2, not 1/(n_i+1) of pooled draws), so
  — exactly like HyperLogLog's small-range correction — when the raw
  estimate is < 2.5k and empty buckets exist, LINEAR COUNTING takes
  over: n̂ = k·ln(k/V) with V the empty-bucket count.  Both branches
  are closed-form on exact integer state; the branch condition is a
  comparison of identical doubles, so an external engine replays the
  same branch.
* ``weighted_sample`` — Efraimidis–Spirakis A-Res: key =
  u^(1/weight) with u an md5-uniform in (0, 1]; the global top-n by
  key IS an exact weighted-without-replacement sample, deterministic
  given the hash, and computed by TakeOrdered (per-partition top-n,
  no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^48 — md5 prefix bits used for the uniform; exact in a double
_HASH_BITS = 48
_HASH_SPACE = 1 << _HASH_BITS


def md5_hash48(c: Column) -> Column:
    """First 48 bits of md5(cast(c as string)) as a bigint."""
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 12), 16, 10
    ).cast("long")


def md5_uniform(c: Column) -> Column:
    """Deterministic uniform in (0, 1] from md5 — exact double
    arithmetic, reproducible in any engine with md5 + hex parse."""
    return (md5_hash48(c).cast("double") + F.lit(1.0)) / F.lit(
        float(_HASH_SPACE)
    )


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """k-bucket min-hash cardinality estimate per group.

    Output: group columns + ``est_distinct`` (double).  All mergeable
    state is integer: min 48-bit hash per (group, bucket), then one
    bigint sum Σ(min+1) with (k − present) · 2^48 added for empty
    buckets; n̂ = k²·2^48/Σ − k."""
    v = F.col(value_col)
    bucket = (
        F.conv(F.substring(F.md5(v.cast("string")), 13, 4), 16, 10)
        .cast("long")
        % k
    )
    per_bucket = (
        df.select(
            *group_cols,
            bucket.alias("_b"),
            md5_hash48(v).alias("_h"),
        )
        .groupBy(*group_cols, "_b")
        .agg(F.min("_h").alias("_m"))
    )
    raw = F.lit(float(k * k * _HASH_SPACE)) / (
        F.col("_s") + (F.lit(k) - F.col("_nb")) * F.lit(_HASH_SPACE)
    ) - F.lit(float(k))
    empty = F.lit(k) - F.col("_nb")
    linear = F.lit(float(k)) * F.log(
        F.lit(float(k)) / empty.cast("double")
    )
    est = F.when(
        (raw < F.lit(2.5 * k)) & (empty > 0), linear
    ).otherwise(raw)
    return (
        per_bucket.groupBy(*group_cols)
        .agg(
            F.sum(F.col("_m") + 1).alias("_s"),
            F.count(F.lit(1)).alias("_nb"),
        )
        .select(*group_cols, est.alias("est_distinct"))
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str,
    n: int,
) -> DataFrame:
    """Exact weighted-without-replacement sample of ``n`` rows
    (Efraimidis–Spirakis A-Res), deterministic from md5(id); the
    selection key is returned as ``_wkey``.  TakeOrdered top-n —
    per-partition heaps, no global sort."""
    u = md5_uniform(F.col(id_col))
    key = F.pow(u, F.lit(1.0) / weight.cast("double"))
    return (
        df.withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), F.col(id_col))
        .limit(n)
    )


def cms_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch build: ``depth × width`` bigint counters —
    row ``d`` for key ``k`` increments cell ``(d, md5(d ∥ k) mod
    width)``.  Returns (d, col, n) with at most depth·width rows.

    This is the fixed-size frequency state for hot-key diagnosis at
    10^10 change events: the full sketch is ~depth·width bigints
    (8 KiB at 4×256) no matter how many rows or distinct conv_ids
    flow through.  The build is one explode + ONE map-side-combining
    HashAggregate — every task emits ≤ depth·width partials, so the
    shuffle is O(tasks·depth·width), independent of input size.
    Sketches MERGE by unioning cells and re-summing (counter sums are
    exact integers → bit-identical under any partitioning, batching,
    or retry), so per-micro-batch sketches roll up for free."""
    k = F.col(key_col).cast("string")
    cell = (
        md5_hash48(
            F.concat(F.col("d").cast("string"), F.lit("|"), F.col("_k"))
        )
        % width
    )
    return (
        df.select(k.alias("_k"))
        .select(
            "_k",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        )
        .select("d", cell.alias("col"))
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch:
    ``est(k) = min over rows d of cell(d, md5(d ∥ k) mod width)`` —
    GUARANTEED ≥ the true count (hash collisions only ever add), so
    a hot-key probe never misses a genuinely hot key.

    ``cells`` is tiny (≤ depth·width rows) and is broadcast; the
    probe side explodes into depth rows per key and aggregates back
    with min() — no shuffle of the sketch, one HashAggregate on the
    probe keys."""
    pe = (
        probes.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        )
    )
    cell = (
        md5_hash48(
            F.concat(
                F.col("d").cast("string"),
                F.lit("|"),
                F.col(key_col).cast("string"),
            )
        )
        % width
    )
    return (
        pe.withColumn("col", cell)
        .join(F.broadcast(cells), ["d", "col"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("est_n")
        )
    )
