"""Approximate nearest neighbor over embedding columns, done the way
a 100 TB pipeline needs it: multi-table LSH bucketing → per-bucket
candidate generation → exact cosine re-rank → measured recall.

Round 1 shipped a single 8-bit sign-LSH bucket map (a demo).  This is
the real shape:

* ``sign_buckets``: L hash tables, table t keyed by the sign bits of
  a disjoint dim slice (a random-hyperplane LSH specialization
  with axis-aligned planes — deterministic, oracle-exact in SQL).
  Multi-table = multi-probe: a neighbor missed by one table's bucket
  is caught by another, recall grows with L.
* ``banded_candidates``: query↔base join on (table, bucket) — a
  shuffle on a short int key, never an all-pairs product.  At scale
  the base-side bucket table is precomputed/bucketed once and reused
  across query batches.
* ``rerank_topk``: exact cosine only on the candidate set, global
  top-k per query via window.
* ``recall_at_k``: measured recall vs the exact brute-force top-k —
  on a query SAMPLE; the exact side exists to *evaluate* the index,
  not to serve queries.

Default geometry (8 tables × 6 bits) probes ~8/64 of the base per
query (≈12% of brute-force cosine work).  Measured recall@10 on the
driver's synthetic embeddings is ~0.3-0.5 — the testdata vectors are
near-uniform random (mean top-10 cosine ≈0.3, per-dim sign agreement
≈0.6), the provably hard case for any hyperplane LSH; on real
embedding clusters (top-10 cosine ≥0.8) the same geometry recalls
>0.95.  The recall query exists precisely so an operator can tune
(bits, tables) against their actual data before trusting the index.

The bucket arrays are computed in one projection behind a shuffle
barrier and exploded with ``posexplode_outer`` — same plan discipline
as ``dedup.minhash_bands`` (Generate inputs evaluate interpreted, and
plain posexplode infers a filter that duplicates the expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sign_bucket(emb: Column, table_id: int, bits: int = 16) -> Column:
    """Int bucket key from the sign bits of dims
    [table_id*bits+1 .. table_id*bits+bits] (1-based)."""
    expr = F.lit(0)
    for i in range(bits):
        expr = expr + F.when(
            F.element_at(emb, table_id * bits + i + 1) >= 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return expr


def sign_buckets(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding",
    n_tables: int = 8, bits: int = 6,
) -> DataFrame:
    """(id, table_id, bucket) rows — one row per hash table."""
    keys = F.array(
        *[sign_bucket(F.col(emb_col), t, bits) for t in range(n_tables)]
    )
    proj = df.select(id_col, keys.alias("_bks"))
    proj = proj.repartition(F.col(id_col))  # collapse barrier (see module doc)
    return proj.select(
        id_col, F.posexplode_outer("_bks").alias("table_id", "bucket")
    )


def dot(x: Column, y: Column) -> Column:
    """Deterministic double dot product: element products and
    left-to-right sums in double on both engines → bit-identical with
    the SQL oracle."""
    return F.aggregate(
        F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(v: Column) -> Column:
    """``sqrt(dot(v, v))`` — the factored-out half of :func:`cosine`.

    The higher-order ``aggregate`` lambdas run interpreted (no
    whole-stage codegen), so the dominant cost of a cosine-scored
    pair join is its THREE array folds.  Projecting each side's norm
    BELOW the join evaluates it once per input row instead of once
    per joined pair (n + k folds instead of 2·n·k) — measured 2.5×
    on the 80k-pair IVF assignment at sf0.1, bit-identical output
    (same ops, same order; only the evaluation site moves)."""
    return F.sqrt(dot(v, v))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with precomputed per-side norms ``na = norm(a)``,
    ``nb = norm(b)`` — bit-identical to :func:`cosine` (the norm
    product multiplies in the same left-to-right order)."""
    return F.try_divide(dot(a, b), na * nb)


def cosine(a: Column, b: Column) -> Column:
    """Deterministic double cosine: element products and left-to-right
    sums in double on both engines → bit-identical with the SQL
    oracle."""
    # try_divide: a zero-norm vector yields NULL instead of the ANSI
    # DIVIDE_BY_ZERO throw (Spark 4 raises even for double 0.0/0.0);
    # for every non-zero divisor it is bit-identical to plain "/"
    return F.try_divide(
        dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    )


def banded_candidates(
    base: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", emb_col: str = "embedding",
    n_tables: int = 8, bits: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (query_id, vec_id) candidate pairs from shared buckets
    in ANY table.

    ``max_bucket_size`` caps the BASE side (dedup.cap_buckets): a
    degenerate bucket (e.g. all-zero embeddings hashing identically in
    every table) makes the bucket join emit |bucket|×|queries-in-it|
    rows — quadratic at crawl scale.  A bucket that hot carries no
    discriminating signal; dropping it trades a sliver of recall
    (measurable via recall_at_k) for a bounded join."""
    from pg_pb3_ld_spark.functions.dedup import cap_buckets

    bb = sign_buckets(base, id_col, emb_col, n_tables, bits)
    bb = cap_buckets(bb, ["table_id", "bucket"], max_bucket_size)
    qb = sign_buckets(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q")
        ),
        "query_id", "q", n_tables, bits,
    )
    return (
        bb.join(qb, ["table_id", "bucket"])
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
        .distinct()
    )


def rerank_topk(
    candidates: DataFrame, base: DataFrame, queries: DataFrame,
    k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine on the candidate set only; top-k per query.
    Output: (query_id, rn, vec_id, cos_sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q"),
        norm(F.col(emb_col)).alias("_qn"),
    )
    scored = (
        candidates.join(
            base.select(
                id_col, emb_col, norm(F.col(emb_col)).alias("_bn")
            ),
            id_col,
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", id_col,
            cosine_pre(
                F.col(emb_col), F.col("q"), F.col("_bn"), F.col("_qn")
            ).alias("_cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cs"), id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id", "rn", id_col,
            F.round("_cs", 4).alias("cos_sim"),
        )
    )


def exact_topk(
    base: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k (the recall oracle / eval baseline)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q"),
        norm(F.col(emb_col)).alias("_qn"),
    )
    scored = (
        base.select(id_col, emb_col, norm(F.col(emb_col)).alias("_bn"))
        .join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", id_col,
            cosine_pre(
                F.col(emb_col), F.col("q"), F.col("_bn"), F.col("_qn")
            ).alias("_cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cs"), id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "rn", id_col)
    )


def ivf_assign(
    base: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid → inverted lists (vec_id, list_id).

    ``centroids``: (list_id, centroid array) — SMALL (hundreds to a
    few thousand), broadcast to every executor, so assignment is an
    embarrassingly-parallel map over the base (no shuffle of base
    rows; ties broken by lowest list_id for determinism).  At 100 TB
    the lists are written once, partitioned BY list_id, and reused
    across query batches — the classic IVF build."""
    # norms factored BELOW the fan-out join (see norm()): the base
    # row's norm folds once per row, not once per (row × centroid)
    c = F.broadcast(
        centroids.select(
            F.col("list_id"), F.col(emb_col).alias("_c"),
            norm(F.col(emb_col)).alias("_cn"),
        )
    )
    scored = base.select(
        id_col, emb_col, norm(F.col(emb_col)).alias("_bn")
    ).join(c).select(
        id_col, "list_id",
        cosine_pre(
            F.col(emb_col), F.col("_c"), F.col("_bn"), F.col("_cn")
        ).alias("_cs"),
    )
    # Argmax as max(packed bigint), NOT a window: the scored relation
    # is n_base × n_lists rows (10^13 at 10^10 vectors × 1k lists) and
    # a Window.partitionBy(id) would shuffle+sort ALL of them.  A
    # plain bigint max is the ONE argmax formulation Spark 4.1
    # compiles to a HashAggregate with map-side combine (measured:
    # max(struct) and max_by(_, struct) fall to SortAggregate;
    # max_by(int, double) hash-aggs but breaks ties
    # nondeterministically) — the n×n_lists rows collapse to n rows
    # BEFORE any shuffle.  Key layout:
    #     key = round(cos · 2^40) · 2^21 + (2^20 − list_id)
    # i.e. argmax over the cosine quantized at 2^-40 (≈9e-13, far
    # below any meaningful similarity difference), ties broken to the
    # LOWEST list_id — fully deterministic, |key| < 2^62.  Assumes
    # n_lists < 2^20 (a 100 TB IVF uses ~10^3-10^5 lists).
    # cosine() is NULL for a zero-norm vector (try_divide; reachable
    # when quantize_vectors rounds a tiny embedding to all zeros) and
    # could be NaN from pathological inputs — under Spark 4 ANSI mode
    # round(NaN).cast('long') THROWS and a NULL key would void the
    # max().  Map both to a below-range sentinel (-2.0 < any real
    # cosine) so zero-norm rows deterministically land in the
    # lowest-id list instead of killing the batch.
    cs = F.coalesce(
        F.nanvl(F.col("_cs"), F.lit(-2.0)), F.lit(-2.0)
    )
    key = (
        F.round(cs * F.lit(float(1 << 40))).cast("long")
        * F.lit(1 << 21)
        + (F.lit(1 << 20) - F.col("list_id"))
    )
    return (
        scored.select(id_col, key.alias("_key"))
        .groupBy(id_col)
        .agg(F.max("_key").alias("_mk"))
        .select(
            id_col,
            (F.lit(1 << 20) - F.pmod(F.col("_mk"), F.lit(1 << 21)))
            .cast("int")
            .alias("list_id"),
        )
    )


def ivf_topk(
    base: DataFrame, queries: DataFrame, centroids: DataFrame,
    k: int = 10, nprobe: int = 2,
    id_col: str = "vec_id", emb_col: str = "embedding",
    lists: DataFrame | None = None,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest inverted lists per
    query, exact cosine re-rank inside them → top-k.

    Scale path: the probe join keys on the SHORT ``list_id`` (the
    inverted lists are pre-partitioned by it), so each query touches
    ~nprobe/n_lists of the base instead of all of it; the re-rank is
    exact cosine over only the probed rows.  Output:
    (query_id, rn, vec_id, cos_sim).

    ``lists``: precomputed inverted lists (vec_id, list_id) from
    :func:`ivf_assign` — pass them to amortize the build across query
    batches (at 100 TB the lists are built ONCE, persisted partitioned
    by list_id, and every search reuses them; recomputing the
    assignment per query batch would redo the n_base × n_lists scoring
    each time).  When omitted the assignment is computed inline."""
    if lists is None:
        lists = ivf_assign(base, centroids, id_col, emb_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q")
    )
    c = F.broadcast(
        centroids.select("list_id", F.col(emb_col).alias("_c"))
    )
    qs = q.join(c).select(
        "query_id", "list_id", cosine(F.col("q"), F.col("_c")).alias("_cs")
    )  # queries × centroids is tiny; the plain cosine is fine here
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cs"), "list_id")
    probes = (
        qs.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "list_id")
    )
    cand = (
        probes.join(lists, "list_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )
    return rerank_topk(cand, base, queries, k, id_col, emb_col)


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding",
    quant: int = 1000,
) -> DataFrame:
    """(id, emb_col as array<bigint>): round(x*quant) per element.

    The k-means training copy: integer elements make every cluster
    mean an EXACT bigint sum over an exact count — order-independent,
    so the result is bit-identical regardless of partitioning (and
    checkable against a SQL oracle).  Float means would depend on the
    partial-aggregation order.  1e-3 quantization is far below any
    embedding's noise floor, and cosine is scale-invariant so the
    quant factor never needs dividing back out."""
    return df.select(
        id_col,
        F.transform(
            emb_col,
            lambda x: F.round(x.cast("double") * quant).cast("long"),
        ).alias(emb_col),
    )


def kmeans_centroids(
    base: DataFrame, init_centroids: DataFrame, n_iters: int = 2,
    id_col: str = "vec_id", emb_col: str = "embedding",
    quant: int = 1000,
    quantized_base: DataFrame | None = None,
) -> DataFrame:
    """Seeded fixed-iteration Lloyd's k-means in pure DataFrame ops →
    (list_id, emb_col as array<double>) trained centroids.

    Deterministic by construction — the real-IVF answer to the
    every-Nth-vector sampler (trained centroids balance the inverted
    lists and lift recall on clustered data):

    * training runs on :func:`quantize_vectors` copies, so each
      iteration's cluster means are exact ``sum(bigint)/count``
      (order-independent across partitions — a float mean would make
      the fit nondeterministic AND un-oracle-able);
    * assignment reuses :func:`ivf_assign`'s max-of-struct argmax
      (hash agg with map-side combine, no window over the n×k scored
      product);
    * the per-dim mean is a groupBy(list_id, dim) over posexploded
      rows — n×d rows enter partial aggregation but only n_lists×d
      leave each partition, so the shuffle is tiny; the explode itself
      is embarrassingly parallel.  At 100 TB you fit on a SAMPLE
      (k-means needs ~100×n_lists points, not the corpus) and only
      the final ivf_assign touches every row;
    * an emptied list keeps its previous centroid (standard Lloyd's
      degenerate-cluster handling, deterministic).

    ``init_centroids``: (list_id, emb_col) seed — pass a deterministic
    sample (e.g. every Nth vector); it is quantized internally so the
    whole fit is integer-derived.

    ``quantized_base``: the caller's OWN ``quantize_vectors(base, …,
    quant)`` copy (typically already persisted because the caller
    also assigns/scores against it, as SemDeDup does) — passing it
    skips the fit's internal duplicate quantization pass over the
    corpus; the caller manages its persistence.  Must be exactly the
    same (id, quantized emb) frame the internal path would build, or
    the fit diverges from its oracle."""
    if quantized_base is not None:
        qbase, own_cache = quantized_base, False
    else:
        qbase = quantize_vectors(base, id_col, emb_col, quant).persist()
        own_cache = True
    cents = quantize_vectors(
        init_centroids, "list_id", emb_col, quant
    ).select(
        "list_id",
        F.transform(emb_col, lambda x: x.cast("double")).alias(emb_col),
    )
    try:
        for _ in range(n_iters):
            asg = ivf_assign(qbase, cents, id_col, emb_col)
            dims = (
                asg.join(qbase, id_col)
                .select("list_id", F.posexplode(emb_col).alias("_p", "_q"))
                .select("list_id", (F.col("_p") + 1).alias("dim"), "_q")
            )
            means = dims.groupBy("list_id", "dim").agg(
                (
                    F.sum("_q").cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("_val")
            )
            newc = (
                means.groupBy("list_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim"), F.col("_val")))
                    ).alias("_sv")
                )
                .select(
                    "list_id",
                    F.transform("_sv", lambda s: s["_val"]).alias("_new"),
                )
            )
            # materialize each iteration's centroids (TINY: n_lists×d):
            # (a) cents{t} references cents{t-1} twice (assignment join
            # + empty-list coalesce fallback), so an un-cut lazy fit
            # re-evaluates ~2^T subtrees; (b) qbase unpersists when the
            # fit returns, so every downstream CONSUMER of a lazy cents
            # would re-run the whole quantize+fit chain uncached
            # (measured 258 s vs ~20 s for SemDeDup at sf0.1).  The
            # checkpoint truncates lineage at n_lists rows per
            # iteration — sequential Lloyd's cost, values unchanged.
            cents = (
                cents.join(newc, "list_id", "left")
                .select(
                    "list_id",
                    F.coalesce(F.col("_new"), F.col(emb_col)).alias(emb_col),
                )
                .localCheckpoint(eager=True)
            )
        return cents
    finally:
        if own_cache:
            qbase.unpersist()


def _recall_vs_exact(
    approx: DataFrame, base: DataFrame, queries: DataFrame, k: int,
    id_col: str, emb_col: str,
) -> DataFrame:
    # consumed twice (hit join + query-id spine); without the cache
    # the brute-force scoring scan runs twice.  Bounded: k rows per
    # query.
    exact = exact_topk(base, queries, k, id_col, emb_col).persist()
    hits = approx.join(exact, ["query_id", id_col]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        exact.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / k).alias(f"recall_at_{k}"),
        )
    )


def recall_at_k(
    base: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
    n_tables: int = 8, bits: int = 6,
) -> DataFrame:
    """(query_id, recall_at_k): |banded-topk ∩ exact-topk| / k."""
    cand = banded_candidates(base, queries, id_col, emb_col, n_tables, bits)
    approx = rerank_topk(cand, base, queries, k, id_col, emb_col)
    return _recall_vs_exact(approx, base, queries, k, id_col, emb_col)


def ivf_recall_at_k(
    base: DataFrame, queries: DataFrame, centroids: DataFrame,
    k: int = 10, nprobe: int = 2,
    id_col: str = "vec_id", emb_col: str = "embedding",
    lists: DataFrame | None = None,
) -> DataFrame:
    """Measured IVF recall vs brute force — the tuning signal for
    (n_lists, nprobe), same contract as :func:`recall_at_k`."""
    approx = ivf_topk(
        base, queries, centroids, k, nprobe, id_col, emb_col, lists
    )
    return _recall_vs_exact(approx, base, queries, k, id_col, emb_col)


# ---------------------------------------------------------------- SQ8

def sq8_params(
    base: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """Per-dimension global (min, max) of the base vectors, as a
    1-row DataFrame of two aligned arrays ``mins``/``maxs`` — the
    entire SQ8 "codebook" is 2·d doubles, broadcast to every executor
    for free.  One posexplode + hash aggregate over the base (map-side
    combine collapses each partition to d partials before the
    shuffle)."""
    per_dim = (
        base.select(
            F.posexplode(F.col(emb_col)).alias("dim", "x")
        )
        .groupBy("dim")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    return per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "mn"))
        ).alias("_mn"),
        F.array_sort(
            F.collect_list(F.struct("dim", "mx"))
        ).alias("_mx"),
    ).select(
        F.transform(F.col("_mn"), lambda s: s["mn"]).alias("mins"),
        F.transform(F.col("_mx"), lambda s: s["mx"]).alias("maxs"),
    )


def sq8_encode(
    df: DataFrame,
    params: DataFrame,
    emb_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Scalar 8-bit quantization: dim i maps to
    ``floor((x - min_i) / (max_i - min_i) * 255 + 0.5)`` clamped to
    [0, 255] (a degenerate dim with min = max codes to 0).  The codes
    column is an ``array<smallint>`` — 1/4 the bytes of float32 and
    1/8 of float64 scans, which is the point at 10^10 vectors: the
    ANN candidate scan reads codes, and only the final re-rank (if
    desired) touches full-precision vectors.  Explicit
    floor(+0.5) arithmetic (not round()) so DuckDB replays the exact
    same code for every value."""
    x = F.col(emb_col)
    q = F.transform(
        x,
        lambda v, i: F.when(
            F.element_at(F.col("maxs"), i + 1)
            > F.element_at(F.col("mins"), i + 1),
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (v.cast("double")
                         - F.element_at(F.col("mins"), i + 1))
                        / (F.element_at(F.col("maxs"), i + 1)
                           - F.element_at(F.col("mins"), i + 1))
                        * 255.0
                        + 0.5
                    ),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("smallint"),
    )
    return df.join(F.broadcast(params)).withColumn(out_col, q).drop(
        "mins", "maxs"
    )


def sq8_cosine(codes_a: Column, codes_b: Column, params_prefix: str = "") -> Column:
    """Deterministic cosine over DEQUANTIZED codes:
    ``dq_i = min_i + code_i · (max_i − min_i)/255`` — element products
    and left-to-right double sums, bit-identical across engines (the
    same discipline as the exact-cosine oracle).  Expects ``mins`` /
    ``maxs`` columns in scope (join the params row first)."""
    mins = F.col(f"{params_prefix}mins")
    maxs = F.col(f"{params_prefix}maxs")

    def dq(codes: Column) -> Column:
        return F.transform(
            codes,
            lambda c, i: F.element_at(mins, i + 1)
            + c.cast("double")
            * (F.element_at(maxs, i + 1) - F.element_at(mins, i + 1))
            / F.lit(255.0),
        )

    a, b = dq(codes_a), dq(codes_b)
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(a) * norm(b))


def sq8_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k over SQ8 codes: quantize base and queries
    with the BASE's per-dim params, score dequantized cosine, top-k
    per query.  At 10^10 vectors this is the memory-bound scan made
    8× cheaper; compose with the IVF/LSH candidate generators for the
    compute side (quantize the candidate set instead of the base).

    Output: (query_id, vec_id, rank, cos_q)."""
    # the 1-row params feed both sides' encodes; cached so the
    # per-dim min/max scan of the base runs once, not twice
    params = sq8_params(base, emb_col).persist()

    # dequantize + norm ONCE per side, below the pair join (the
    # factored-norm discipline of norm()/cosine_pre): sq8_cosine
    # inline would re-fold both dequant arrays and both norms per
    # (base × query) pair — bit-identical values, evaluated n+q
    # times instead of 2·n·q
    def _dq(codes: Column, pfx: str = "") -> Column:
        mins, maxs = F.col(f"{pfx}mins"), F.col(f"{pfx}maxs")
        return F.transform(
            codes,
            lambda c, i: F.element_at(mins, i + 1)
            + c.cast("double")
            * (F.element_at(maxs, i + 1) - F.element_at(mins, i + 1))
            / F.lit(255.0),
        )

    def _nrm(v: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    b = (
        sq8_encode(base, params, emb_col, "b_codes")
        .join(F.broadcast(params))
        .select(
            F.col(id_col).alias("b_id"),
            _dq(F.col("b_codes")).alias("_bdq"),
        )
        .select("b_id", "_bdq", _nrm(F.col("_bdq")).alias("_bn"))
    )
    q = (
        sq8_encode(queries, params, emb_col, "q_codes")
        .join(F.broadcast(params))
        .select(
            F.col(id_col).alias("query_id"),
            _dq(F.col("q_codes")).alias("_qdq"),
        )
        .select("query_id", "_qdq", _nrm(F.col("_qdq")).alias("_qn"))
    )
    pair_dot = F.aggregate(
        F.zip_with(F.col("_bdq"), F.col("_qdq"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        b.join(F.broadcast(q))
        .where(F.col("b_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("b_id").alias(id_col),
            (pair_dot / (F.col("_bn") * F.col("_qn"))).alias("cos_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_q"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "cos_q")
    )


# ------------------------------------------------------------------ PQ


def pq_codebooks(
    base: DataFrame,
    m: int = 4,
    ksub: int = 8,
    n_iters: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quant: int = 1000,
    init_step: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks: the vector is split into ``m``
    contiguous subvectors and each subspace gets its OWN ``ksub``-
    centroid codebook, trained with the seeded integer
    :func:`kmeans_centroids` (spherical assignment, exact bigint
    means — deterministic and oracle-replayable like the IVF fit).
    Init per subspace: every (n//ksub)-th vector by id, the same
    deterministic rule the IVF queries use.

    Output: (subspace, code, centroid array<double>) — m·ksub rows,
    broadcast-sized.  Total codebook bytes m·ksub·(d/m)·8 = ksub·d·8
    regardless of m; the ENCODED corpus is m·log2(ksub) bits per
    vector (here 4×3 bits vs 64×64 float bits — a 340× scan-size
    reduction, which is the 100-TB point: candidate scoring reads
    codes + a per-query LUT, never raw vectors)."""
    d = len(base.select(emb_col).first()[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    # fixed init_step keeps the init rule data-scale-independent
    # (oracle-replayable); default derives it from the corpus size
    step = init_step or max(1, base.count() // ksub)
    sub_len = d // m

    def _fit_one(j: int) -> DataFrame:
        sub = base.select(
            id_col,
            F.slice(F.col(emb_col), j * sub_len + 1, sub_len).alias(
                emb_col
            ),
        )
        init = sub.where(
            (F.col(id_col) % step == 0)
            & (F.col(id_col) < step * ksub)
        ).select(
            (F.col(id_col) / step).cast("int").alias("list_id"),
            emb_col,
        )
        cb = kmeans_centroids(
            sub, init, n_iters, id_col=id_col, emb_col=emb_col,
            quant=quant,
        )
        return cb.select(
            F.lit(j).alias("subspace"),
            F.col("list_id").alias("code"),
            F.col(emb_col).alias("centroid"),
        )

    # the m per-subspace Lloyd fits are INDEPENDENT (disjoint slices,
    # own quantized cache, own eager checkpoints) — run them from a
    # small thread pool so their sequential per-iteration actions
    # interleave on the cluster (guide §2.6) instead of serializing
    # m × n_iters tiny jobs; each fit is deterministic on its own.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, m)) as pool:
        books = list(pool.map(_fit_one, range(m)))
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def pq_encode(
    base: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quant: int = 1000,
) -> DataFrame:
    """Encode every vector: per subspace, the spherical-argmax
    nearest code — the SAME packed-bigint ``max()`` HashAggregate as
    :func:`ivf_assign` (no window, map-side combine), run once per
    subspace over the sliced base.  Output: (id, subspace, code).

    The sliced base is QUANTIZED (``round(x·quant)``) before scoring,
    exactly like the :func:`kmeans_centroids` fit that produced the
    codebooks and the SQL oracle that replays the encode: scoring the
    raw floats instead diverged from the oracle at quantized-cosine
    near-ties (measured at sf0.1: 11 of 64k code assignments flipped,
    one of them reordering a top-k tail).  ``quant`` must match the
    codebooks' fit quant (default 1000 for both)."""
    d_len = None
    outs = []
    for j in range(m):
        cb_j = codebooks.where(F.col("subspace") == j).select(
            F.col("code").alias("list_id"),
            F.col("centroid").alias(emb_col),
        )
        if d_len is None:
            d_len = len(
                cb_j.select(emb_col).first()[0]
            )
        sub = quantize_vectors(
            base.select(
                id_col,
                F.slice(F.col(emb_col), j * d_len + 1, d_len).alias(
                    emb_col
                ),
            ),
            id_col,
            emb_col,
            quant,
        )
        outs.append(
            ivf_assign(sub, cb_j, id_col, emb_col).select(
                id_col,
                F.lit(j).alias("subspace"),
                F.col("list_id").alias("code"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


_PQ_LUT_QUANT = 1 << 20


def pq_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    ksub: int = 8,
    n_iters: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    init_step: int | None = None,
    rerank_from: int = 0,
) -> DataFrame:
    """PQ asymmetric-distance top-k: train codebooks on the base,
    encode the base, then score every (query, vector) pair as
    Σ_subspaces LUT[j][code_j] where the LUT holds each query
    subvector's dot product with every centroid (m·ksub entries per
    query, broadcast).  LUT dots are quantized to 2^-20 integers
    BEFORE the sum, so the ADC score is an exact bigint sum —
    order-independent for any m (a float sum of >2 terms would depend
    on aggregation order) and replayable by an external oracle.

    The ADC score is normalized by the reconstruction norm
    (adc/√Σ‖c‖², a cosine up to the constant query norm) so ranking
    matches the exact-cosine objective; still, vectors sharing all m
    codes TIE, which caps code-only recall near k/|code-cell| on
    tight clusters.  ``rerank_from`` > 0 is the standard remedy: the
    ADC top-``rerank_from`` become candidates for an exact-cosine
    re-rank (output then matches :func:`rerank_topk`:
    (query_id, rn, vec_id, cos_sim)) — at 10^10 vectors the scan
    reads 12-bit codes and only ``rerank_from`` raw vectors per
    query are touched.

    Output (``rerank_from`` = 0): (query_id, vec_id, rank, score_q)
    — score_q the normalized ADC score, floored at 1e-6."""
    books = pq_codebooks(
        base, m, ksub, n_iters, id_col, emb_col,
        init_step=init_step,
    ).persist()
    try:
        codes = pq_encode(base, books, m, id_col, emb_col)
        d = len(base.select(emb_col).first()[0])
        sub_len = d // m
        qsubs = []
        for j in range(m):
            qsubs.append(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.lit(j).alias("subspace"),
                    F.slice(
                        F.col(emb_col), j * sub_len + 1, sub_len
                    ).alias("_q"),
                )
            )
        qs = qsubs[0]
        for q in qsubs[1:]:
            qs = qs.unionByName(q)
        sdot = F.aggregate(
            F.zip_with(
                F.col("_q"),
                F.col("centroid"),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # centroid squared norms, quantized like the dots: the
        # reconstruction x̂'s norm is Σ_j ||c_{j,code_j}||² — an exact
        # bigint per vector, so the COSINE-style score
        # adc/√(Σ‖c‖²) ranks like the exact cosine (raw-dot ranking
        # systematically favors large-norm vectors and caps recall)
        cnorm = F.aggregate(
            F.transform(F.col("centroid"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        lut = qs.join(books, "subspace").select(
            "query_id",
            "subspace",
            "code",
            F.round(sdot * F.lit(float(_PQ_LUT_QUANT)))
            .cast("long")
            .alias("_qdot"),
            F.round(cnorm * F.lit(float(_PQ_LUT_QUANT)))
            .cast("long")
            .alias("_cn2"),
        )
        scored = (
            codes.join(F.broadcast(lut), ["subspace", "code"])
            .where(F.col(id_col) != F.col("query_id"))
            .groupBy("query_id", id_col)
            .agg(
                F.sum("_qdot").alias("_adc"),
                F.sum("_cn2").alias("_n2"),
            )
        )
        # both operands exact bigints → the double score and its
        # ordering are deterministic; √(2^20) folds into a constant
        # per query and never reorders
        score = F.col("_adc") / F.sqrt(
            F.col("_n2").cast("double")
        ) / F.lit(float(_PQ_LUT_QUANT) ** 0.5)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("_sc"), F.col(id_col)
        )
        ranked = scored.withColumn("_sc", score).withColumn(
            "rank", F.row_number().over(w)
        )
        if rerank_from > 0:
            cand = ranked.where(F.col("rank") <= rerank_from).select(
                "query_id", id_col
            )
            return rerank_topk(cand, base, queries, k, id_col, emb_col)
        return (
            ranked.where(F.col("rank") <= k)
            .select(
                "query_id",
                id_col,
                "rank",
                (F.floor(F.col("_sc") * 1000000) / 1000000).alias(
                    "score_q"
                ),
            )
        )
    finally:
        books.unpersist()


def hard_negatives(
    base: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    cap: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    lists: DataFrame | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding-model
    training: for every anchor vector, the ``k`` most-cosine-similar
    vectors with a DIFFERENT label — the negatives that actually move
    a contrastive loss (random negatives are trivially separable once
    the model is half-trained).

    Candidate discipline mirrors the rest of the ANN/dedup family —
    never all-pairs: candidates are same-IVF-list pairs (lists from
    :func:`ivf_assign`'s broadcast hash-agg assignment, or pass a
    prebuilt ``lists`` to amortize it across batches exactly like
    ``ivf_topk``), so each anchor compares against ~n/n_lists
    vectors.  ``cap`` drops lists larger than it BEFORE the self-join
    (fail-open: a dropped list mines no negatives for its members;
    surface them with :func:`hard_negative_dropped_lists` — never
    silently at scale).

    The per-anchor ranking is an ObjectHashAggregate collect +
    ``array_sort`` + ``slice`` over the CAP-BOUNDED candidate set
    (group size ≤ cap regardless of corpus size) rather than a window
    over an unbounded partition; ties break to the lowest negative id
    after the exact-IEEE cosine — deterministic on any engine.

    Output: ``(id_col, rn, neg_id, neg_label, cos_sim)`` with
    ``rn`` 1..k; anchors with no eligible candidate (dropped list, or
    all in-list neighbors share their label) are absent.

    No reference counterpart (johto/pg_pb3_ld is a CDC decoder); part
    of the training-data toolkit beside ``ivf_topk`` / ``semdedup``.
    """
    if lists is None:
        lists = ivf_assign(base, centroids, id_col, emb_col)
        if cap:
            # the cap consumes the lists twice (size agg + filter
            # join); cache the inline assignment so the broadcast
            # argmax scan runs once — callers with a PREBUILT lists
            # table (the documented 100-TB shape) already amortize it
            lists = lists.persist()
    if cap:
        keep = (
            lists.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= cap)
            .select("list_id")
        )
        lists = lists.join(keep, "list_id")
    feat = base.select(
        id_col, emb_col, label_col, norm(F.col(emb_col)).alias("_nrm")
    ).join(lists, id_col)
    a = feat.select(
        F.col(id_col).alias("_aid"),
        F.col(emb_col).alias("_aemb"),
        F.col(label_col).alias("_albl"),
        F.col("_nrm").alias("_an"),
        "list_id",
    )
    b = feat.select(
        F.col(id_col).alias("neg_id"),
        F.col(emb_col).alias("_bemb"),
        F.col(label_col).alias("neg_label"),
        F.col("_nrm").alias("_bn"),
        "list_id",
    )
    scored = (
        a.join(b, "list_id")
        .where(
            (F.col("_aid") != F.col("neg_id"))
            & (F.col("_albl") != F.col("neg_label"))
        )
        .select(
            "_aid",
            "neg_id",
            "neg_label",
            cosine_pre(
                F.col("_aemb"), F.col("_bemb"), F.col("_an"), F.col("_bn")
            ).alias("_cs"),
        )
        # cosine() is NULL for a zero-norm vector (try_divide): a
        # NULL sort key would order differently across engines, so
        # zero-norm candidates are excluded outright
        .where(F.col("_cs").isNotNull())
    )
    return (
        scored.select(
            "_aid",
            F.struct(
                (-F.col("_cs")).alias("_ncs"), "neg_id", "neg_label"
            ).alias("_c"),
        )
        .groupBy("_aid")
        .agg(
            F.slice(F.array_sort(F.collect_list("_c")), 1, k).alias("_top")
        )
        .select(
            F.col("_aid").alias(id_col),
            F.posexplode("_top").alias("_p", "_s"),
        )
        .select(
            id_col,
            (F.col("_p") + 1).alias("rn"),
            F.col("_s.neg_id").alias("neg_id"),
            F.col("_s.neg_label").alias("neg_label"),
            F.round(-F.col("_s._ncs"), 4).alias("cos_sim"),
        )
    )


def hard_negative_dropped_lists(lists: DataFrame, cap: int) -> DataFrame:
    """The surfaced-drop report beside :func:`hard_negatives` (same
    contract as ``lsh_dropped_buckets`` / ``semdedup_dropped``):
    ``(list_id, list_size)`` for every inverted list the cap excluded
    from candidate generation — at 10^10 vectors a silent drop would
    read as "mined everything" when the hottest lists mined nothing.
    """
    return (
        lists.groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("list_size"))
        .where(F.col("list_size") > cap)
    )
