"""SemDeDup (k-means-partitioned semantic dedup) — survivor rule,
cap behavior, plan shape.

The operator layers the training-data toolkit on the engine; it has
no counterpart in /root/reference (a CDC decoder).  Fixture: two
well-separated direction cones in 4-d so the seeded k-means reliably
splits them, with known near-duplicate groups inside each cone.
"""

import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import dedup


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    # Cone A ~ +x axis, cone B ~ +y axis.  Inside cone A: vecs 0,1,2
    # are near-identical (cos > 0.99); 3 is distinct (cos ~ 0.6 to
    # them).  Inside cone B: 50,51 near-identical; 52 distinct.
    rows = [
        (0, (1.0, 0.02, 0.0, 0.0)),
        (1, (1.0, 0.03, 0.0, 0.0)),
        (2, (0.99, 0.02, 0.01, 0.0)),
        (3, (0.8, 0.6, 0.0, 0.0)),
        (50, (0.0, 1.0, 0.02, 0.0)),
        (51, (0.0, 1.0, 0.03, 0.0)),
        (52, (0.0, 0.8, 0.6, 0.0)),
    ]
    return _vecs(spark, rows)


def _run(spark, corpus, **kw):
    init = corpus.where(F.col("vec_id").isin(0, 50)).select(
        F.when(F.col("vec_id") == 0, 0).otherwise(1)
        .cast("int").alias("list_id"),
        "embedding",
    )
    out = dedup.semdedup_clusters(corpus, init, n_iters=2, **kw)
    return {r["vec_id"]: r for r in out.collect()}


def test_dup_groups_and_singletons(spark, corpus):
    got = _run(spark, corpus, threshold=0.95)
    # every vector appears exactly once
    assert set(got) == {0, 1, 2, 3, 50, 51, 52}
    # group {0,1,2} is one component labeled by its min id
    assert got[0]["cluster_id"] == got[1]["cluster_id"] == \
        got[2]["cluster_id"] == 0
    assert got[50]["cluster_id"] == got[51]["cluster_id"] == 50
    # distinct vectors are singleton components that keep themselves
    for vid in (3, 52):
        assert got[vid]["cluster_id"] == vid and got[vid]["keep"]
    # exactly one survivor per dup component
    assert sum(got[v]["keep"] for v in (0, 1, 2)) == 1
    assert sum(got[v]["keep"] for v in (50, 51)) == 1


def test_survivor_is_least_centroid_similar(spark, corpus):
    # The paper's rule: within a dup group keep the member least
    # similar to its cluster centroid.  In cone A the centroid is
    # dominated by the tight {0,1,2,3} mean near +x; vec 2 tilts off
    # the (x,y) plane (z component) — verify against an explicit
    # recomputation rather than hand-guessing.
    got = _run(spark, corpus, threshold=0.95)
    kept_a = [v for v in (0, 1, 2) if got[v]["keep"]]
    assert len(kept_a) == 1
    # recompute centroid-cos ranking exactly as the operator defines
    # it (2-iter quantized k-means → assigned centroid → cosine)
    from pg_pb3_ld_spark.functions import ann

    init = corpus.where(F.col("vec_id").isin(0, 50)).select(
        F.when(F.col("vec_id") == 0, 0).otherwise(1)
        .cast("int").alias("list_id"),
        "embedding",
    )
    cents = ann.kmeans_centroids(corpus, init, n_iters=2)
    qv = ann.quantize_vectors(corpus)
    cos_rows = (
        qv.join(F.broadcast(
            cents.select("list_id", F.col("embedding").alias("_c"))))
        .select(
            "vec_id", "list_id",
            ann.cosine(F.col("embedding"), F.col("_c")).alias("cs"),
        )
        .collect()
    )
    by_vec = {}
    for r in cos_rows:
        if r["list_id"] == got[r["vec_id"]]["list_id"]:
            by_vec[r["vec_id"]] = r["cs"]
    expect = min((0, 1, 2), key=lambda v: (by_vec[v], v))
    assert kept_a[0] == expect


def test_cap_disarms_pair_join_but_keeps_rows(spark, corpus):
    # cap smaller than cone A's size: its pairs are dropped, every
    # member degrades to a singleton that keeps itself — rows never
    # silently disappear.
    got = _run(spark, corpus, threshold=0.95, max_cluster_size=3)
    for vid in (0, 1, 2, 3):
        assert got[vid]["cluster_id"] == vid and got[vid]["keep"]
    # cone B (size 3 <= cap) still dedups
    assert got[50]["cluster_id"] == got[51]["cluster_id"] == 50
    assert sum(got[v]["keep"] for v in (50, 51)) == 1


def test_plan_has_no_window_or_cartesian(spark, corpus):
    init = corpus.where(F.col("vec_id").isin(0, 50)).select(
        F.when(F.col("vec_id") == 0, 0).otherwise(1)
        .cast("int").alias("list_id"),
        "embedding",
    )
    out = dedup.semdedup_clusters(corpus, init, threshold=0.95)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_zero_norm_vector_survives(spark):
    # a vector that quantizes to all zeros must not kill the batch
    # (NULL cosine → sentinel key) and stays a singleton
    rows = [
        (0, (1.0, 0.01, 0.0, 0.0)),
        (1, (1.0, 0.02, 0.0, 0.0)),
        (2, (0.0001, 0.0001, 0.0, 0.0)),
    ]
    corpus = _vecs(spark, rows)
    init = corpus.where(F.col("vec_id") == 0).select(
        F.lit(0).cast("int").alias("list_id"), "embedding"
    )
    out = dedup.semdedup_clusters(corpus, init, threshold=0.95)
    got = {r["vec_id"]: r for r in out.collect()}
    assert set(got) == {0, 1, 2}
    assert got[2]["cluster_id"] == 2 and got[2]["keep"]
    assert got[0]["cluster_id"] == got[1]["cluster_id"] == 0
