"""Bloom filter (`functions/bloom.py`): no false negatives ever,
false-positive rate near theory, bounded collect, bit-exact build
under any partitioning."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_probe,
    bloom_words,
)


def test_no_false_negatives(spark):
    members = spark.createDataFrame(
        [(i * 7,) for i in range(500)], "v long"
    )
    out = bloom_probe(members, "v", bloom_build(members, "v"))
    assert out.count() == 500


def test_false_positive_rate_near_theory(spark):
    n, m, k = 500, 4096, 3
    members = spark.createDataFrame(
        [(i,) for i in range(n)], "v long"
    )
    words = bloom_words(bloom_build(members, "v", m, k), m)
    probes = spark.createDataFrame(
        [(10**6 + i,) for i in range(4000)], "v long"
    )
    fp = probes.where(
        bloom_might_contain(F.col("v"), words, m, k)
    ).count()
    expect = (1 - math.exp(-k * n / m)) ** k  # ≈ 2.4%
    rate = fp / 4000
    assert rate < 3 * expect + 0.01, (rate, expect)


def test_build_partition_invariant_bitwise(spark):
    rows = [(i * 13 + 1,) for i in range(300)]

    def words(parts):
        df = spark.createDataFrame(rows, "v long").repartition(parts)
        return bloom_words(bloom_build(df, "v"))

    assert words(2) == words(11)


def test_words_dense_and_bounded(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")
    w = bloom_words(bloom_build(df, "v", n_bits=1024), n_bits=1024)
    assert len(w) == 1024 // 32
    assert sum(bin(x & 0xFFFFFFFF).count("1") for x in w) <= 6


def test_probe_plan_has_no_join_or_shuffle(spark):
    members = spark.createDataFrame([(i,) for i in range(50)], "v long")
    words = bloom_words(bloom_build(members, "v"))
    big = spark.range(1000).select(F.col("id").alias("v"))
    plan = (
        big.where(bloom_might_contain(F.col("v"), words))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan
