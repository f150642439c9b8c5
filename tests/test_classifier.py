"""Trainable quality classifier: partition-invariant trajectory,
actual learning on a separable fixture, exact scoring."""

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import classifier


def _docs(spark):
    # "quality" docs: all-distinct tokens; "junk": one token repeated
    rows = []
    for i in range(40):
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(8))))
        rows.append((100 + i, ("spam " * 9).strip()))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_training_is_partition_invariant(spark):
    docs = _docs(spark)
    feat1 = classifier.doc_features(docs)
    feat2 = classifier.doc_features(
        docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    )
    w1 = classifier.logreg_fit(feat1, n_iters=3)
    w2 = classifier.logreg_fit(feat2, n_iters=3)
    assert w1 == w2  # bit-identical, not approximately equal


def test_classifier_learns_the_separable_fixture(spark):
    docs = _docs(spark)
    feat = classifier.doc_features(docs)
    w = classifier.logreg_fit(feat, n_iters=5)
    scored = classifier.logreg_score(feat, w)
    acc = scored.where(
        F.col("pred") == F.col("y")
    ).count() / scored.count()
    assert acc >= 0.95, acc
    # weights moved off the origin and diversity got positive weight
    assert any(x != 0.0 for x in w)
    assert w[2] > 0  # f2 = distinct-token ratio drives the label


def test_margin_sign_matches_pred_and_is_stable(spark):
    docs = _docs(spark)
    feat = classifier.doc_features(docs)
    w = classifier.logreg_fit(feat, n_iters=2)
    a = {r["doc_id"]: r for r in classifier.logreg_score(feat, w).collect()}
    b = {
        r["doc_id"]: r
        for r in classifier.logreg_score(
            classifier.doc_features(_docs(spark).repartition(7)), w
        ).collect()
    }
    for k in a:
        assert a[k]["margin"] == b[k]["margin"]
        assert a[k]["pred"] == (1 if a[k]["margin"] >= 0 else 0) or \
            abs(a[k]["margin"]) < 1e-6


def test_zero_iters_returns_origin(spark):
    feat = classifier.doc_features(_docs(spark))
    assert classifier.logreg_fit(feat, n_iters=0) == [0.0] * 4


def test_plan_is_single_hash_agg_per_iteration(spark):
    feat = classifier.doc_features(_docs(spark))
    p = classifier.hard_sigmoid(classifier._z([0.1, 0.2, 0.3, 0.4]))
    err = F.col("y").cast("double") - p
    agg = feat.agg(
        *[
            F.sum(
                F.round(err * F.col(f"f{j}") * F.lit(classifier.QUANT))
                .cast("long")
            ).alias(f"g{j}")
            for j in range(4)
        ]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Window" not in plan and "SortAggregate" not in plan
