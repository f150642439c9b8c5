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
