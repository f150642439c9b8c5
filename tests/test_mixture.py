"""Data-mixing manifest: apportionment + copy counts vs a pure-Python
reference (the dual-implementation discipline of the codec goldens)."""

import hashlib

import pytest

from pg_pb3_ld_spark.functions import mixture


def py_copies(doc_id, quota, n):
    u = int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:15], 16)
    return quota // n + (1 if u * n < (quota % n) * (1 << 60) else 0)


def test_apportion_hand_case():
    q = mixture.apportion(
        {"src0": 1, "src1": 2, "src2": 3, "src3": 6, "srcz": 2}, 300
    )
    # base 21/42/64/128/42 (sum 297), remainders 6/12/4/8/12 → the 3
    # leftover units go to src1 (12), srcz (12, name tie after src1),
    # src3 (8)
    assert q == {"src0": 21, "src1": 43, "src2": 64, "src3": 129,
                 "srcz": 43}
    assert sum(q.values()) == 300


def test_apportion_exact_and_ties():
    for total in (0, 1, 7, 100, 12345):
        q = mixture.apportion({"a": 1, "b": 1, "c": 1}, total)
        assert sum(q.values()) == total
        # equal weights + equal remainders: ties resolve a, b, c
        vals = [q["a"], q["b"], q["c"]]
        assert vals == sorted(vals, reverse=True)
    with pytest.raises(ValueError):
        mixture.apportion({}, 10)
    with pytest.raises(ValueError):
        mixture.apportion({"a": 0}, 10)
    with pytest.raises(ValueError):
        mixture.apportion({"a": -1, "b": 2}, 10)


def _docs(spark, per_dom=6, doms=("x", "y")):
    rows = [(d * per_dom + i, dom)
            for d, dom in enumerate(doms) for i in range(per_dom)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_manifest_matches_python_reference(spark):
    docs = _docs(spark, per_dom=6, doms=("x", "y"))
    weights, total = {"x": 3, "y": 1}, 20
    quotas = mixture.apportion(weights, total)  # x:15, y:5
    got = {
        r["doc_id"]: (r["n_copies"], r["domain_quota"], r["domain_docs"])
        for r in mixture.mixture_sample(docs, weights, total).collect()
    }
    for doc_id in range(12):
        dom = "x" if doc_id < 6 else "y"
        exp = py_copies(doc_id, quotas[dom], 6)
        if exp == 0:
            assert doc_id not in got
        else:
            assert got[doc_id] == (exp, quotas[dom], 6)


def test_upsampling_full_epochs(spark):
    # quota 20 over 6 docs → every doc appears ≥3 times
    docs = _docs(spark, per_dom=6, doms=("x",))
    out = mixture.mixture_sample(docs, {"x": 1}, 20).collect()
    assert len(out) == 6
    assert all(r["n_copies"] >= 3 for r in out)
    assert all(r["n_copies"] <= 4 for r in out)


def test_unweighted_domain_dropped(spark):
    docs = _docs(spark, per_dom=4, doms=("x", "y", "z"))
    out = mixture.mixture_sample(docs, {"x": 1}, 4).collect()
    assert {r["source"] for r in out} == {"x"}


def test_partition_invariance(spark):
    docs = _docs(spark, per_dom=25, doms=("x", "y", "z"))
    weights, total = {"x": 5, "y": 2, "z": 1}, 120
    a = sorted(
        map(tuple, mixture.mixture_sample(
            docs.repartition(1), weights, total).collect())
    )
    b = sorted(
        map(tuple, mixture.mixture_sample(
            docs.repartition(7, "doc_id"), weights, total).collect())
    )
    assert a == b and len(a) > 0


def test_summary_surfaces_absent_domain(spark):
    docs = _docs(spark, per_dom=10, doms=("x", "y"))
    weights, total = {"x": 2, "y": 1, "ghost": 1}, 40
    rows = {r["source"]: r for r in
            mixture.mixture_summary(docs, weights, total).collect()}
    assert set(rows) == {"x", "y", "ghost"}
    assert rows["ghost"]["quota"] == 10
    assert rows["ghost"]["n_docs"] == 0
    assert rows["ghost"]["achieved"] == 0
    assert sum(r["quota"] for r in rows.values()) == total
    man = mixture.mixture_sample(docs, weights, total).collect()
    for dom in ("x", "y"):
        assert rows[dom]["achieved"] == sum(
            r["n_copies"] for r in man if r["source"] == dom
        )
