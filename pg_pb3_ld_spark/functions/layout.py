"""Z-order (Morton) clustered data layout.

At 100 TB the scan cost of a selective query is decided by LAYOUT:
parquet row-group min/max pruning only helps if rows with nearby
values share files.  Sorting by one column clusters that column only;
interleaving the bits of several columns (a Z-order / Morton key)
bounds every clustered column's per-file value span at once — the
same technique behind Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's
``sort_order(zorder(...))``, rebuilt here with pure Catalyst integer
expressions (JVM-side whole-stage codegen, no UDF).

Pieces:

* ``spread16`` / ``morton16``: the classic part1by1 magic-number bit
  spread — 4 shift/mask steps per column, so a 2-D key is ~10 integer
  ops, constant-folded into codegen;
* ``quantize16``: exact integer min-max quantization to 16 bits
  (``(v - min) * 65535 div max(range, 1)`` — no floating point, so an
  external oracle reproduces keys bit-for-bit);
* ``write_zordered``: repartitionByRange on the key + sortWithin
  Partitions, then a plain parquet write.  Range partitioning samples
  the key distribution — NO global single-partition sort; each output
  file covers a compact Z-range, i.e. a small axis-aligned tile in
  value space.  ``tests/test_layout.py`` measures the per-file
  bounding-box shrinkage vs an unclustered write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(c: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of a 32-bit
    value (part1by1): bit i moves to bit 2i."""
    # promote to long FIRST: the y-spread's <<1 would overflow a
    # 32-bit input's sign bit
    c = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton16(x: Column, y: Column) -> Column:
    """32-bit Morton key of two 16-bit values: x in even bits, y in
    odd bits — Z-order curve position."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def sql_spread16(expr: str) -> str:
    """The same part1by1 spread as ANSI-ish SQL text (for oracles)."""
    e = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def sql_morton16(x: str, y: str) -> str:
    return f"({sql_spread16(x)} | ({sql_spread16(y)} << 1))"


def quantize16(c: Column, cmin: Column, cmax: Column) -> Column:
    """Exact integer 16-bit min-max quantization (floor division;
    constant columns map to 0)."""
    rng = F.greatest(cmax - cmin, F.lit(1))
    return F.floor(
        ((c.cast("bigint") - cmin) * 65535) / rng
    ).cast("bigint")


def write_zordered(
    df: DataFrame,
    key: Column,
    path: str,
    num_files: int = 16,
) -> None:
    """Cluster ``df`` into ``num_files`` parquet files by Z-range:
    range-repartition on the Morton key (sampled boundaries, fully
    parallel) and sort within each partition so row groups are
    monotone in the key."""
    (
        df.withColumn("_z", key)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def shard_key(key: Column, n_shards: int) -> Column:
    """Portable deterministic shard assignment: first 15 md5 hex
    chars of the key → bigint → pmod ``n_shards``.  Same construction
    as the snapshot store's bucket_fn and the train/test split — no
    RNG, no row order, no partitioning dependence, so the SAME key
    lands in the SAME shard on any engine, any run, any cluster size
    (what makes a 100-TB corpus export auditable and resumable)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_shards),
    ).cast("int")


def row_digest(cols: list[Column]) -> Column:
    """Per-row content digest: first 15 md5 hex chars of the
    unit-separator-joined column values → bigint.  Digest columns
    must be cast-stable across engines (strings / integers — not
    floats or timestamps); NULLs are skipped by concat_ws on both
    engines (disclosed: NULL and '' collide, acceptable for a
    checksum)."""
    joined = F.concat_ws("\x1f", *[c.cast("string") for c in cols])
    return F.conv(
        F.substring(F.md5(joined), 1, 15), 16, 10
    ).cast("long")


def shard_manifest(
    df: DataFrame, key_col: str, n_shards: int,
    digest_cols: list[str],
) -> DataFrame:
    """(shard, n_rows, n_keys, min_key, max_key, checksum) — the
    content manifest a training-corpus export ships with its shards.

    ``checksum`` is the decimal(38,0) SUM of per-row
    :func:`row_digest` values: order-independent (sum), collision-
    negligible at 2^-60/row, exactly replayable by any engine that
    can md5 — so a consumer can verify a shard WITHOUT trusting the
    producer's file layout, and two exports of the same logical data
    (different partitioning, different file counts) certify equal.
    One map-side-combining hash agg on the shard key; no shuffle of
    payload bytes."""
    keyed = df.select(
        shard_key(F.col(key_col), n_shards).alias("shard"),
        F.col(key_col).alias("_k"),
        row_digest([F.col(c) for c in digest_cols]).alias("_d"),
    )
    return (
        keyed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_k").alias("n_keys"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
            F.sum(F.col("_d").cast("decimal(38,0)")).alias("checksum"),
        )
    )


def export_shards(
    df: DataFrame, out_dir: str, key_col: str, n_shards: int,
    digest_cols: list[str],
) -> DataFrame:
    """Write ``df`` as a sharded parquet corpus + return the manifest
    recomputed FROM THE WRITTEN FILES (certifying what landed on
    disk, not what was intended), joined with per-shard file stats.

    Layout: ``out_dir/shard=K/part-*.parquet``.  The write keeps
    natural parallelism (``partitionBy`` splits directories; a shard
    directory may hold many files — the manifest certifies CONTENT,
    not file layout).  File stats are a driver walk over n_shards
    directories (bounded metadata, no Spark pass)."""
    import os

    spark = df.sparkSession
    (
        df.withColumn("shard", shard_key(F.col(key_col), n_shards))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    manifest = shard_manifest(
        written.drop("shard"), key_col, n_shards, digest_cols
    )
    stats = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        sdir = os.path.join(out_dir, name)
        files = [
            f for f in os.listdir(sdir) if f.endswith(".parquet")
        ]
        stats.append((
            int(name.split("=", 1)[1]),
            len(files),
            sum(os.path.getsize(os.path.join(sdir, f)) for f in files),
        ))
    stats_df = spark.createDataFrame(
        stats, "shard int, n_files int, bytes bigint"
    )
    return manifest.join(F.broadcast(stats_df), "shard")


def shard_refresh_plan(
    changes: DataFrame,
    current: DataFrame,
    key_col: str,
    n_shards: int,
) -> DataFrame:
    """Incremental export maintenance: which shards of a sharded
    corpus export are STALE given the change feed since the export's
    snapshot, and what each must now contain.

    ``changes`` = a ``SnapshotStore.read_changes`` slice (needs
    ``change_type`` + the key column); ``current`` = the live table.
    One row per shard that received ANY change: the INSERT / UPDATE /
    DELETE counts to apply and ``n_rows_after`` (the shard's post-
    refresh row count — 0 when the refresh empties it).  Untouched
    shards are absent: their files and manifest entries remain valid,
    which is the point — at 10^10 rows re-exporting 3 stale shards
    instead of all N is the difference between a minutes-long
    incremental refresh and a full-corpus rewrite.

    Scale shape: two map-side-combining hash aggs (feed slice,
    current table) + one left equi join on the tiny shard key — no
    payload shuffle; compose with :func:`export_shards` restricted to
    the stale shard list, and the shard assignment stays the portable
    md5 :func:`shard_key`, so the refreshed manifest certifies
    against the untouched shards' old entries."""
    ch = changes.select(
        shard_key(F.col(key_col), n_shards).alias("shard"),
        "change_type",
    )
    plan = ch.groupBy("shard").agg(
        F.sum(F.when(F.col("change_type") == "INSERT", 1).otherwise(0))
        .alias("n_inserts"),
        F.sum(F.when(F.col("change_type") == "UPDATE", 1).otherwise(0))
        .alias("n_updates"),
        F.sum(F.when(F.col("change_type") == "DELETE", 1).otherwise(0))
        .alias("n_deletes"),
    )
    cur = (
        current.select(
            shard_key(F.col(key_col), n_shards).alias("shard")
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows_after"))
    )
    return plan.join(cur, "shard", "left").select(
        "shard",
        "n_inserts",
        "n_updates",
        "n_deletes",
        F.coalesce("n_rows_after", F.lit(0)).alias("n_rows_after"),
    )
