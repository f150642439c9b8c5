"""Trainable document-quality classifier in pure Catalyst: full-batch
gradient descent for a linear (logistic-surrogate) model, built so the
TRAINING TRAJECTORY is bit-identical under any partitioning and
replayable by an external SQL engine — the classifier sibling of the
integer-exact k-means fit (functions/ann.py) and the BPE trainer
(functions/bpe.py).

Determinism/oracle design (each choice is load-bearing):

* **hard sigmoid**, not exp: ``p = clamp(0.25·z + 0.5, 0, 1)`` is the
  standard quantized-network surrogate and uses only exact IEEE ops
  (mul/add/min/max) — ``exp`` could differ in the last ulp between
  the JVM and another engine's libm, and a 1-ulp difference upstream
  of a rounding boundary would fork the trajectory;
* **integer-exact gradients**: each row contributes
  ``round((y − p)·f_j·2^20)`` as a BIGINT — the per-feature gradient
  is then an order-independent exact integer SUM (a float sum would
  depend on partial-aggregation order across partitions);
* **rational features**: every feature is a ratio of integers
  (token/char counts over fixed or integer denominators), so feature
  doubles are identical on any engine;
* **driver weight updates in plain IEEE**: ``w += lr·((g/2^20)/n)``
  — the same expression an oracle evaluates in SQL doubles.

Scale shape: one persisted feature pass, then ONE map-side-combining
hash aggregate per GD iteration (output = n_features cells + a
count); weights ride as literals (broadcast-by-constant).  At 10^10
docs each iteration is a single scan-agg — no shuffle of rows, no
Python, no MLlib.

No reference counterpart (johto/pg_pb3_ld is a CDC decoder); part of
the training-data toolkit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUANT = float(1 << 20)
N_FEATURES = 4  # bias + 3 text signals


def doc_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, y, f0..f3): exact-rational quality features + label.

    f0 bias; f1 length in tokens (÷64); f2 distinct-token ratio
    (lexical diversity); f3 mean token length (÷64).  Label: a doc is
    "quality" when at least half its tokens are distinct — the
    training target the synthetic corpus supports; swap the label
    column for human/model labels in production."""
    toks = F.split(F.col(text_col), " ")
    n_toks = F.size(toks)
    n_dst = F.size(F.array_distinct(toks))
    n_chr = F.length(F.col(text_col))
    denom = F.greatest(n_toks, F.lit(1)).cast("double")
    return docs.select(
        id_col,
        (2 * n_dst >= n_toks).cast("int").alias("y"),
        F.lit(1.0).alias("f0"),
        (n_toks / F.lit(64.0)).alias("f1"),
        (n_dst / denom).alias("f2"),
        (n_chr / (F.lit(64.0) * denom)).alias("f3"),
    )


def _z(w: list[float]):
    z = F.lit(w[0]) * F.col("f0")
    for j in range(1, N_FEATURES):
        z = z + F.lit(w[j]) * F.col(f"f{j}")
    return z


def hard_sigmoid(z):
    return F.least(
        F.greatest(F.lit(0.25) * z + F.lit(0.5), F.lit(0.0)), F.lit(1.0)
    )


def logreg_fit(
    feat: DataFrame, n_iters: int = 3, lr: float = 0.5,
) -> list[float]:
    """Full-batch GD from w=0; returns the trained weights.

    Each iteration is ONE hash-aggregate action (n_features exact
    bigint gradient sums + the row count); the weight vector lives on
    the driver and enters the next iteration as literals."""
    feat = feat.persist()
    try:
        w = [0.0] * N_FEATURES
        for _ in range(n_iters):
            p = hard_sigmoid(_z(w))
            err = F.col("y").cast("double") - p
            aggs = [
                F.sum(
                    F.round(err * F.col(f"f{j}") * F.lit(QUANT))
                    .cast("long")
                ).alias(f"g{j}")
                for j in range(N_FEATURES)
            ] + [F.count(F.lit(1)).alias("n")]
            row = feat.agg(*aggs).collect()[0]
            n = float(row["n"])
            w = [
                w[j] + lr * ((row[f"g{j}"] / QUANT) / n)
                for j in range(N_FEATURES)
            ]
        return w
    finally:
        feat.unpersist()


def logreg_score(feat: DataFrame, w: list[float]) -> DataFrame:
    """(id, y, margin, pred): exact-rational margin (floored at 1e-6
    for stable cross-engine hashing), pred = margin >= 0."""
    id_col = feat.columns[0]
    z = _z(w)
    return feat.select(
        id_col,
        "y",
        (F.floor(z * F.lit(1e6)) / F.lit(1e6)).alias("margin"),
        (z >= 0).cast("int").alias("pred"),
    )
