"""Sketch operators (`functions/sketches.py`): accuracy bound,
bit-exact partition invariance (the property the integer state
exists for), and weighted-sample semantics vs a pure-Python replay."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.sketches import (
    distinct_sketch,
    weighted_sample,
)


def _est(spark, n_distinct, k=64, partitions=4):
    df = (
        spark.range(n_distinct * 3)
        .select((F.col("id") % n_distinct).alias("v"))
        .repartition(partitions)
    )
    df = df.withColumn("g", F.lit("a"))
    (row,) = distinct_sketch(df, ["g"], "v", k=k).collect()
    return row["est_distinct"]


def test_sketch_accuracy_bound(spark):
    for n in (100, 2000, 20000):
        est = _est(spark, n)
        # stochastic-averaging stderr ~ 1/sqrt(k) = 12.5%; allow 4 sigma
        assert abs(est - n) / n < 0.5, (n, est)


def test_sketch_partition_invariant_bitwise(spark):
    # the whole point of integer mergeable state: the estimate is the
    # SAME double no matter how the data was partitioned
    a = _est(spark, 5000, partitions=2)
    b = _est(spark, 5000, partitions=13)
    assert a == b


def test_sketch_small_groups_exactish(spark):
    # n << k: every value owns its bucket; estimate within ~15%
    df = spark.createDataFrame(
        [("g1", i) for i in range(5)] + [("g2", i) for i in range(40)],
        "g string, v int",
    )
    got = {
        r["g"]: r["est_distinct"]
        for r in distinct_sketch(df, ["g"], "v", k=256).collect()
    }
    assert abs(got["g1"] - 5) / 5 < 0.2
    assert abs(got["g2"] - 40) / 40 < 0.2


def _py_key(doc_id: int, w: int) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
    u = (h + 1.0) / float(1 << 48)
    return u ** (1.0 / w)


def test_weighted_sample_matches_python_replay(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = [
        r["doc_id"]
        for r in weighted_sample(df, F.col("w"), "doc_id", 20)
        .orderBy(F.desc("_wkey"), "doc_id")
        .collect()
    ]
    want = [
        d for d, _ in sorted(
            rows, key=lambda t: (-_py_key(t[0], t[1]), t[0])
        )[:20]
    ]
    assert got == want


def test_weighted_sample_weight_monotone(spark):
    # an overwhelming weight is effectively always selected
    rows = [(i, 1) for i in range(200)] + [(999, 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]
        for r in weighted_sample(df, F.col("w"), "doc_id", 10).collect()
    }
    assert 999 in got and len(got) == 10


# ------------------------------------------------------ count-min


def _cms(spark, rows):
    from pg_pb3_ld_spark.functions.sketches import cms_cells

    df = spark.createDataFrame(rows, "k long")
    return cms_cells(df, "k", depth=4, width=32)


def test_cms_never_underestimates(spark):
    from pg_pb3_ld_spark.functions.sketches import cms_cells, cms_estimate

    # skewed multiset: key i appears (i % 7) + 1 times
    rows = [(i,) for i in range(60) for _ in range((i % 7) + 1)]
    df = spark.createDataFrame(rows, "k long")
    cells = cms_cells(df, "k", depth=4, width=32)
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["est_n"]
        for r in cms_estimate(cells, probes, "k", depth=4, width=32)
        .collect()
    }
    exact = {i: (i % 7) + 1 for i in range(60)}
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert est[k] >= e  # the CMS one-sided guarantee
    # the hottest key's estimate is still in the right ballpark
    # (width 32 on 60 keys: collisions add, min-of-4 bounds them)
    assert est[6] <= exact[6] + sum(exact.values()) // 4


def test_cms_cells_partition_invariant_and_mergeable(spark):
    rows = [(i % 13,) for i in range(200)]
    base = sorted(
        (r["d"], r["col"], r["n"]) for r in _cms(spark, rows).collect()
    )
    shuffled = sorted(
        (r["d"], r["col"], r["n"])
        for r in cms_cells_repart(spark, rows).collect()
    )
    assert base == shuffled
    # merging two halves' sketches by summing cells == whole sketch
    from pg_pb3_ld_spark.functions.sketches import cms_cells
    import pyspark.sql.functions as F

    a = cms_cells(
        spark.createDataFrame(rows[:100], "k long"), "k", 4, 32
    )
    b = cms_cells(
        spark.createDataFrame(rows[100:], "k long"), "k", 4, 32
    )
    merged = sorted(
        (r["d"], r["col"], r["n"])
        for r in a.unionByName(b)
        .groupBy("d", "col")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    assert merged == base


def cms_cells_repart(spark, rows):
    from pg_pb3_ld_spark.functions.sketches import cms_cells

    df = spark.createDataFrame(rows, "k long").repartition(7)
    return cms_cells(df, "k", depth=4, width=32)


def test_cms_estimate_plan_broadcasts_cells(spark):
    from pg_pb3_ld_spark.functions.sketches import cms_cells, cms_estimate

    df = spark.createDataFrame([(1,), (2,)], "k long")
    cells = cms_cells(df, "k", 4, 32)
    plan = (
        cms_estimate(cells, df, "k", 4, 32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
