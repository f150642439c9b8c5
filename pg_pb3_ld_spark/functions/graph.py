"""Iterative graph algebra: integer-exact PageRank.

The domain-graph ranking step of a web-corpus pipeline (seed-quality
propagation, spam demotion).  Spark has no native iteration, so the
fixed-point runs as an UNROLLED driver loop of joins+aggregations —
each iteration is one hash join on ``src`` (edges × scores, both
pre-partitionable by the same key) and one map-side-combining hash
aggregate on ``dst``; n nodes and e edges shuffle O(e) rows per
iteration, never materializing anything driver-side.

Determinism is the design constraint (the same discipline as the
k-means/IVF fits): scores live as SCALED BIGINTS and every division
is an explicit floor, so partial-aggregation order cannot change a
single bit, the result is identical under any partitioning, and an
external SQL engine replays the exact trajectory.  The usual float
PageRank would differ in the last ulps per partitioning — fine for
ranking, useless for an equality oracle.

Classic simplifications, stated: dangling nodes (no out-edges) leak
their mass (no redistribution term), and the damping base uses the
unnormalized 1.0-per-node convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, score) after ``n_iters`` of
    ``score' = (100−d)%·scale + Σ_in floor(d%·floor(score_u/deg_u)/100)``
    over integer scores initialized to ``scale`` (1.0 per node).

    ``edges`` may be a multigraph — parallel edges carry mass once
    each; ``deg`` counts them individually."""
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    scores = nodes.select(
        "node", F.lit(scale).cast("long").alias("score")
    )
    base = (100 - damping_pct) * scale // 100
    for _ in range(n_iters):
        contrib = (
            edges.join(deg, src_col)
            .join(
                scores.select(
                    F.col("node").alias(src_col), "score"
                ),
                src_col,
            )
            .select(
                dst.alias("node"),
                F.floor(
                    F.lit(damping_pct)
                    * F.floor(F.col("score") / F.col("_deg"))
                    / 100
                )
                .cast("long")
                .alias("_c"),
            )
        )
        inflow = contrib.groupBy("node").agg(
            F.sum("_c").alias("_in")
        )
        scores = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.coalesce(F.col("_in"), F.lit(0))
            ).alias("score"),
        )
    return scores
