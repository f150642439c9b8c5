"""Banded ANN tests: bucket geometry, candidate generation, re-rank
correctness against brute force, and the recall measurement."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import ann


def _vectors(spark, n=60, dim=48, n_clusters=4, seed=7):
    """Clustered vectors: members of a cluster share a dominant
    direction, so true neighbors are same-cluster (cos ≥ ~0.9) and
    sign-LSH must recall them."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + 0.05 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_sign_buckets_shape_and_determinism(spark):
    emb = _vectors(spark)
    b = ann.sign_buckets(emb, n_tables=8, bits=6).collect()
    assert len(b) == 60 * 8
    assert {r["table_id"] for r in b} == set(range(8))
    assert all(0 <= r["bucket"] < 64 for r in b)
    b2 = ann.sign_buckets(emb, n_tables=8, bits=6).collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, b2))


def test_rerank_matches_bruteforce_on_clustered_data(spark):
    """On clustered vectors every same-cluster neighbor shares all
    sign buckets, so the banded top-k equals the exact top-k."""
    emb = _vectors(spark)
    queries = emb.where(F.col("vec_id") < 2)
    cand = ann.banded_candidates(emb, queries, n_tables=8, bits=6)
    approx = {
        (r["query_id"], r["rn"]): r["vec_id"]
        for r in ann.rerank_topk(cand, emb, queries, k=5).collect()
    }
    exact = {
        (r["query_id"], r["rn"]): r["vec_id"]
        for r in ann.exact_topk(emb, queries, k=5).collect()
    }
    assert approx == exact


def test_recall_is_one_on_clustered_data(spark):
    emb = _vectors(spark)
    queries = emb.where(F.col("vec_id") < 3)
    rec = {
        r["query_id"]: r["recall_at_5"]
        for r in ann.recall_at_k(emb, queries, k=5, n_tables=8, bits=6).collect()
    }
    assert rec == {0: 1.0, 1: 1.0, 2: 1.0}


def test_candidates_never_pair_query_with_itself(spark):
    emb = _vectors(spark)
    queries = emb.where(F.col("vec_id") < 5)
    cand = ann.banded_candidates(emb, queries).collect()
    assert all(r["vec_id"] != r["query_id"] for r in cand)


def test_recall_zero_when_no_candidates(spark):
    """A query vector orthogonal to everything lands in its own
    buckets: recall must report 0.0, not drop the query."""
    emb = _vectors(spark, n=20, n_clusters=1)
    # a hostile query: opposite sign pattern in every table slice
    q = spark.createDataFrame(
        [(999, [(-1.0) ** (i + 1) * 100.0 for i in range(48)], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rec = ann.recall_at_k(emb, q, k=5).collect()
    assert len(rec) == 1
    assert rec[0]["recall_at_5"] in (0.0, 1.0)  # present either way


def test_sq8_codes_bounded_and_degenerate_dim_zero(spark):
    df = spark.createDataFrame(
        [(0, [0.0, -1.0, 5.0]), (1, [0.0, 1.0, -5.0]),
         (2, [0.0, 0.5, 0.0])],
        "vec_id int, embedding array<double>",
    )
    params = ann.sq8_params(df)
    codes = {
        r["vec_id"]: r["codes"]
        for r in ann.sq8_encode(df, params).collect()
    }
    for cs in codes.values():
        assert all(0 <= c <= 255 for c in cs)
    # dim 0 is constant (min == max) → every code 0
    assert all(cs[0] == 0 for cs in codes.values())
    # extremes map to the ends of the range
    assert codes[0][1] == 0 and codes[1][1] == 255
    assert codes[0][2] == 255 and codes[1][2] == 0


def test_sq8_topk_recall_near_exact(spark):
    """256 quantization levels ≈ full precision: SQ8 top-10 must
    recall ≥0.9 of the exact cosine top-10 per query (the whole point
    of the 8×-smaller scan is NOT trading recall away)."""
    base = _vectors(spark, n=80, dim=32, n_clusters=5, seed=11)
    queries = base.where(F.col("vec_id") < 4)
    approx = ann.sq8_topk(base, queries, k=10)
    exact = ann.exact_topk(base, queries, k=10)
    a = {
        (r["query_id"], r["vec_id"]) for r in approx.collect()
    }
    e = {
        (r["query_id"], r["vec_id"]) for r in exact.collect()
    }
    assert len(a & e) / len(e) >= 0.9


# ---------------------------------------------------------------- #
# hard-negative mining                                             #
# ---------------------------------------------------------------- #


def _hn_centroids(spark):
    """Two well-separated directions → two IVF lists."""
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "list_id int, embedding array<double>",
    )


def _hn_vectors(spark):
    """Cluster 0 around e1, cluster 1 around e2; labels alternate
    WITHIN each cluster so every anchor has same-list candidates of
    both its own and the other label."""
    rows = []
    for i in range(12):
        if i % 2 == 0:
            v = [1.0, 0.02 * (i + 1), 0.0]
        else:
            v = [0.02 * (i + 1), 1.0, 0.0]
        rows.append((i, v, i % 4 // 2))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_labels_differ_and_ranked(spark):
    emb = _hn_vectors(spark)
    out = ann.hard_negatives(emb, _hn_centroids(spark), k=3).collect()
    assert out, "expected mined negatives"
    lbl = {r["vec_id"]: r for r in emb.collect()}
    by_anchor: dict = {}
    for r in out:
        assert lbl[r["vec_id"]]["label"] != r["neg_label"]
        assert r["neg_label"] == lbl[r["neg_id"]]["label"]
        by_anchor.setdefault(r["vec_id"], []).append(r)
    for rows in by_anchor.values():
        rows.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_hard_negatives_matches_bruteforce(spark):
    """With one list per cluster and no cap, in-list mining equals a
    brute-force different-label top-k within the cluster."""
    emb = _hn_vectors(spark)
    out = ann.hard_negatives(emb, _hn_centroids(spark), k=2).collect()
    rows = emb.collect()
    import numpy as np

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for anchor in rows:
        same_list = [
            r for r in rows
            if r["vec_id"] % 2 == anchor["vec_id"] % 2
            and r["vec_id"] != anchor["vec_id"]
            and r["label"] != anchor["label"]
        ]
        want = sorted(
            same_list,
            key=lambda r: (-cos(anchor["embedding"], r["embedding"]),
                           r["vec_id"]),
        )[:2]
        got = sorted(
            [r for r in out if r["vec_id"] == anchor["vec_id"]],
            key=lambda r: r["rn"],
        )
        assert [r["neg_id"] for r in got] == [r["vec_id"] for r in want]


def test_hard_negatives_cap_drops_list_fail_open(spark):
    """A list over the cap mines nothing for its members, and the
    drop is surfaced by hard_negative_dropped_lists."""
    emb = _hn_vectors(spark)
    cents = _hn_centroids(spark)
    # list 0 and list 1 each hold 6 vectors; cap=5 drops both, cap=6
    # keeps both
    none = ann.hard_negatives(emb, cents, k=3, cap=5).collect()
    assert none == []
    lists = ann.ivf_assign(emb, cents)
    dropped = ann.hard_negative_dropped_lists(lists, cap=5).collect()
    assert sorted((r["list_id"], r["list_size"]) for r in dropped) == [
        (0, 6), (1, 6),
    ]
    assert ann.hard_negative_dropped_lists(lists, cap=6).collect() == []
    full = ann.hard_negatives(emb, cents, k=3, cap=6).collect()
    assert len(full) == len(
        ann.hard_negatives(emb, cents, k=3).collect()
    )


def test_hard_negatives_partition_invariance_and_prebuilt_lists(spark):
    emb = _hn_vectors(spark)
    cents = _hn_centroids(spark)
    base = sorted(
        map(tuple, ann.hard_negatives(emb, cents, k=3).collect())
    )
    shuffled = sorted(
        map(tuple,
            ann.hard_negatives(
                emb.repartition(7), cents, k=3
            ).collect())
    )
    assert base == shuffled
    lists = ann.ivf_assign(emb, cents)
    reused = sorted(
        map(tuple,
            ann.hard_negatives(emb, cents, k=3, lists=lists).collect())
    )
    assert base == reused


def test_hard_negatives_plan_no_window_no_nlj(spark):
    import io
    from contextlib import redirect_stdout

    emb = _hn_vectors(spark)
    df = ann.hard_negatives(emb, _hn_centroids(spark), k=3, cap=10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the only non-equi join must be ivf_assign's broadcast-centroid
    # cross join (small side broadcast); the candidate self-join is
    # equi on list_id (shuffle/SMJ is the correct plan at scale) and
    # the ranking is an aggregate, not a window
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
