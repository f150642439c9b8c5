"""Bradley-Terry policy ratings from preference pairs — the reward-
modeling half of the RLHF data loop, fit in pure Catalyst with the
repo's integer-exact full-batch GD discipline (the pairwise sibling
of functions/classifier.py; same hard-sigmoid surrogate, same
quantized-bigint gradients, same weights-as-literals shape).

Given (winner, loser) pairs over a SMALL set of policies (models,
prompt variants, decoding configs — the thing A/B'd at training
time), Bradley-Terry models P(w beats l) = sigmoid(θ_w − θ_l) and the
fit recovers one strength per policy.  Design points:

* **hard sigmoid** surrogate (exact IEEE mul/add/min/max only) so the
  trajectory cannot fork on a libm ulp between engines;
* each pair contributes ``qe = round((1 − p)·2^20)`` ONCE and enters
  the winner's gradient as +qe and the loser's as −qe — exact
  antisymmetry, so ``Σ_m g_m = 0`` per pair and ``Σ_m θ_m`` stays
  exactly 0.0 through every iteration (a free invariant the tests
  pin);
* per-model gradients are order-independent exact BIGINT sums → the
  fit is bit-identical under any partitioning or cluster size;
* one map-side-combining hash aggregate per iteration (2·k
  conditional sums + a count over the pair scan); θ rides as
  literals.  At 10^9 pairs an iteration is a single scan-agg — no
  row shuffle, no Python, no MLlib.

No reference counterpart (johto/pg_pb3_ld is a CDC decoder); part of
the training-data toolkit downstream of
``textops.preference_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pg_pb3_ld_spark.functions.classifier import QUANT, hard_sigmoid


def _theta_expr(col: str, theta: list[float]):
    e = F.lit(0.0)
    for m, t in enumerate(theta):
        e = F.when(F.col(col) == m, F.lit(t)).otherwise(e)
    return e


def _pair_counts(
    pairs: DataFrame, winner_col: str, loser_col: str
) -> DataFrame:
    """(winner, loser, _n) tallies — ≤ k² rows regardless of corpus
    size.  ``qe`` depends only on the (winner, loser) pair of model
    ids, so every GD gradient sum over 10^9 pairs equals the same sum
    over these tallies with each term scaled by ``_n`` (exact bigint
    × bigint; n·qe ≤ 2^63 for any real corpus).  ONE scan of the
    pairs replaces the per-iteration full scan."""
    return pairs.groupBy(
        F.col(winner_col).cast("int").alias(winner_col),
        F.col(loser_col).cast("int").alias(loser_col),
    ).agg(F.count(F.lit(1)).alias("_n"))


def _bt_fit_counts(
    counts: DataFrame,
    n_models: int,
    winner_col: str,
    loser_col: str,
    n_iters: int,
    lr: float,
) -> list[float]:
    theta = [0.0] * n_models
    for _ in range(n_iters):
        delta = _theta_expr(winner_col, theta) - _theta_expr(
            loser_col, theta
        )
        qe = F.round((F.lit(1.0) - hard_sigmoid(delta)) * F.lit(QUANT)
                     ).cast("long")
        nqe = F.col("_n") * qe
        aggs = [
            (
                F.sum(F.when(F.col(winner_col) == m, nqe).otherwise(0))
                - F.sum(F.when(F.col(loser_col) == m, nqe).otherwise(0))
            ).alias(f"g{m}")
            for m in range(n_models)
        ] + [F.sum("_n").alias("n")]
        row = counts.agg(*aggs).collect()[0]
        n = float(row["n"])
        theta = [
            theta[m] + lr * ((row[f"g{m}"] / QUANT) / n)
            for m in range(n_models)
        ]
    return theta


def bt_fit(
    pairs: DataFrame,
    n_models: int,
    winner_col: str = "winner_model",
    loser_col: str = "loser_model",
    n_iters: int = 8,
    lr: float = 2.0,
) -> list[float]:
    """Full-batch GD from θ=0; returns the strength per policy id
    (ids must be 0..n_models−1).  Self-pairs (winner == loser) are
    exact no-ops (+qe and −qe cancel in the same sum).

    The pair scan runs ONCE (the (winner, loser) tally pre-
    aggregation — see :func:`_pair_counts`); each GD iteration is a
    driver-side Spark agg over ≤ k² tally rows with bit-identical
    gradients (n identical exact-integer terms sum to n·qe)."""
    counts = _pair_counts(pairs, winner_col, loser_col).persist()
    try:
        return _bt_fit_counts(
            counts, n_models, winner_col, loser_col, n_iters, lr
        )
    finally:
        counts.unpersist()


def bt_ratings(
    pairs: DataFrame,
    n_models: int,
    winner_col: str = "winner_model",
    loser_col: str = "loser_model",
    n_iters: int = 8,
    lr: float = 2.0,
) -> DataFrame:
    """(model_id, n_wins, n_losses, theta6) — fitted Bradley-Terry
    strengths plus the raw win/loss tallies.  ``theta6`` is the
    strength floored to 1e-6 (stable cross-engine hashing, same
    convention as the classifier margins).  Every model 0..n−1 gets a
    row even when it never appears in a pair (θ stays 0)."""
    # ONE pair scan serves the fit and both tallies (the per-pair
    # values depend only on (winner, loser) — see _pair_counts)
    counts = _pair_counts(pairs, winner_col, loser_col).persist()
    theta = _bt_fit_counts(
        counts, n_models, winner_col, loser_col, n_iters, lr
    )
    spark = pairs.sparkSession
    base = spark.createDataFrame(
        [(m, float(t)) for m, t in enumerate(theta)],
        "model_id int, _theta double",
    )
    wins = counts.groupBy(
        F.col(winner_col).alias("model_id")
    ).agg(F.sum("_n").alias("n_wins"))
    losses = counts.groupBy(
        F.col(loser_col).alias("model_id")
    ).agg(F.sum("_n").alias("n_losses"))
    return (
        base.join(wins, "model_id", "left")
        .join(losses, "model_id", "left")
        .select(
            "model_id",
            F.coalesce("n_wins", F.lit(0)).alias("n_wins"),
            F.coalesce("n_losses", F.lit(0)).alias("n_losses"),
            (F.floor(F.col("_theta") * F.lit(1e6)) / F.lit(1e6))
            .alias("theta6"),
        )
    )


def win_matrix(
    pairs: DataFrame,
    winner_col: str = "winner_model",
    loser_col: str = "loser_model",
) -> DataFrame:
    """Pairwise win-rate matrix — the head-to-head eval report that
    accompanies the Bradley-Terry fit: one row per unordered policy
    pair ``(model_a < model_b)`` with ``a_wins``, ``b_wins``,
    ``n_games`` and ``a_winrate4`` (floor-truncated to 4 decimals,
    the cross-engine convention).  Self-pairs are excluded (they
    carry no preference signal).

    Scale shape: ONE map-side-combining hash agg on the canonical
    (min, max) pair key — the matrix is at most k·(k−1)/2 rows
    regardless of corpus size."""
    w = F.col(winner_col).cast("int")
    l = F.col(loser_col).cast("int")
    canon = pairs.where(w != l).select(
        F.least(w, l).alias("model_a"),
        F.greatest(w, l).alias("model_b"),
        (w < l).cast("int").alias("_a_won"),
    )
    return (
        canon.groupBy("model_a", "model_b")
        .agg(
            F.sum("_a_won").alias("a_wins"),
            F.sum(F.lit(1) - F.col("_a_won")).alias("b_wins"),
            F.count(F.lit(1)).alias("n_games"),
        )
        .select(
            "model_a", "model_b", "a_wins", "b_wins", "n_games",
            (F.floor(F.col("a_wins") / F.col("n_games") * 10000)
             / 10000).alias("a_winrate4"),
        )
    )
