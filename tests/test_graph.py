"""Integer-exact PageRank (`functions/graph.py`): hand-computed
trajectory, bit-exact partition invariance, and ranking sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.graph import pagerank


def _run(spark, edges, n_iters=1, partitions=None):
    df = spark.createDataFrame(edges, "src string, dst string")
    if partitions:
        df = df.repartition(partitions)
    return {
        r["node"]: r["score"]
        for r in pagerank(df, n_iters=n_iters).collect()
    }


def test_one_iteration_hand_computed(spark):
    # a: out-edges to b and c (deg 2); b: edge to c (deg 1); c: none
    got = _run(spark, [("a", "b"), ("a", "c"), ("b", "c")], n_iters=1)
    # scores start at 1_000_000; base = 150_000
    # b: 150000 + floor(85*floor(1000000/2)/100) = 150000 + 425000
    # c: 150000 + 425000 (from a) + floor(85*1000000/100)=850000
    # a: no in-edges -> base only
    assert got == {
        "a": 150000,
        "b": 575000,
        "c": 150000 + 425000 + 850000,
    }


def test_partition_invariant_bitwise(spark):
    edges = [
        (f"n{i % 17}", f"n{(i * 5 + 2) % 17}") for i in range(300)
    ]
    a = _run(spark, edges, n_iters=3, partitions=2)
    b = _run(spark, edges, n_iters=3, partitions=13)
    assert a == b


def test_hub_ranks_highest(spark):
    # everyone links to 'hub'; hub links to one node
    edges = [(f"n{i}", "hub") for i in range(10)] + [("hub", "n0")]
    got = _run(spark, edges, n_iters=3)
    assert max(got, key=got.get) == "hub"
