"""Byte-pair-encoding tokenizer: distributed training + encoding.

The tokenizer-fitting step every LLM pretraining pipeline runs before
packing (SURVEY.md LLM-pipeline family; no counterpart in the
reference — pg_pb3_ld stops at wire decode, /root/reference/decoder/
pg_pb3_ld.c:1-100).  Everything here is exact-deterministic so the
full training trajectory AND the encoded output replay bit-for-bit in
DuckDB (the same discipline as ann.kmeans_centroids' unrolled Lloyd's).

Representation
--------------
A word is a *symbol string*: its characters separated by single
spaces, with a final ``_`` end-of-word symbol (``the`` → ``t h e _``).
Symbols never contain spaces, so the adjacent pair ``(a, b)`` is the
substring ``" a b "`` of ``" " + sym + " "`` and a merge is ONE
non-overlapping left-to-right ``replace`` — the exact greedy-BPE
application order, and the same semantics in Spark's ``replace`` and
DuckDB's ``replace`` (both are indexOf loops that continue after each
replacement, never rescanning replaced text).

Scale shape
-----------
Training never touches the corpus after one up-front word-count
collapse: the iterated state is the *distinct-word table* (vocab-sized
— ~10^6 rows whether the corpus is 1 GB or 100 TB), and each merge
iteration is one explode + map-side-combining hash aggregate over it,
a distributed top-1 (``orderBy(...).limit(1)`` = TakeOrdered, no
global sort materialized), and a pure string projection.  The driver
holds exactly one row per iteration — the scalar-watermark discipline.

Encoding is a chain of ``n_merges`` ``replace`` expressions applied in
rank order — pure whole-stage-codegen projection, no shuffle, no
Python.  Cross-word false merges cannot happen on the flat document
string: every learned pair's LEFT symbol is ``_``-free (``_`` is
always word-final in training, so no pair ever starts at or spans
past it), and in the flat string every word boundary is guarded by a
``_`` symbol.  The literal expression chain is the right plan up to a
few hundred merges; production-vocab encoding (32k+ merges) swaps the
same merge table into a broadcast mapInPandas trie — disclosed, not
built, because the chain covers every test/bench scale here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "_"  # end-of-word symbol; corpus alphabet is [a-z] (TESTDATA.md)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse the corpus to the distinct-word frequency table —
    the ONE corpus-sized pass in BPE training."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def sym_expr(word) -> F.Column:
    """Initial symbol string: chars space-separated + final EOW."""
    return F.concat(
        F.trim(F.regexp_replace(word, "(.)", "$1 ")), F.lit(" " + EOW)
    )


def _pairs(sym) -> F.Column:
    toks = F.split(sym, " ")
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def merge_expr(sym, pair: str) -> F.Column:
    """Apply one merge (``"a b"`` → ``"ab"``) to a symbol string.
    Non-overlapping left-to-right — greedy BPE order."""
    merged = pair.replace(" ", "")
    return F.trim(
        F.replace(
            F.concat(F.lit(" "), sym, F.lit(" ")),
            F.lit(" %s " % pair),
            F.lit(" %s " % merged),
        )
    )


def train(words: DataFrame, n_merges: int) -> list[str]:
    """Learn ``n_merges`` merges from a (word, cnt) table.

    Returns pairs as ``"left right"`` strings in rank order.  Argmax
    tiebreak: highest summed count, then lexicographically smallest
    pair — total order, so the trajectory is partition-invariant and
    an external engine replays it exactly.
    """
    cur = words.select("word", "cnt", sym_expr(F.col("word")).alias("sym"))
    cur = cur.cache()
    merges: list[str] = []
    prev = None
    try:
        for _ in range(n_merges):
            # ONE action per merge: this collect materializes cur's
            # cache (still able to read the parent's), after which the
            # parent cache can go.  The round-5 shape paid a second
            # per-iteration action (nxt.count()) purely to materialize
            # before unpersisting — deferring the unpersist one
            # iteration halves the job count with the same trajectory.
            top = (
                cur.select(F.col("cnt"), F.explode(_pairs(F.col("sym"))).alias("pr"))
                .groupBy("pr")
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("pr"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break  # every word is a single symbol — vocabulary saturated
            pair = top[0]["pr"]
            merges.append(pair)
            nxt = cur.select(
                "word", "cnt", merge_expr(F.col("sym"), pair).alias("sym")
            ).cache()
            prev, cur = cur, nxt
    finally:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return merges


def encode_expr(text, merges: list[str]) -> F.Column:
    """Encode a whole document to its BPE symbol string (symbols
    space-separated): per-word symbol init, then every merge in rank
    order.  Pure codegen projection."""
    flat = F.array_join(
        F.transform(
            F.filter(F.split(text, " "), lambda w: w != ""),
            lambda w: sym_expr(w),
        ),
        " ",
    )
    for pair in merges:
        flat = merge_expr(flat, pair)
    return flat


def train_from_corpus(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> list[str]:
    return train(word_counts(df, text_col), n_merges)


def encode_docs(
    df: DataFrame,
    merges: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE stats: token count, distinct-token count, md5 of
    the encoded symbol string (pins exact bytes, not just lengths)."""
    enc = encode_expr(F.col(text_col), merges)
    out = df.select(F.col(id_col), enc.alias("_enc"))
    toks = F.split(F.col("_enc"), " ")
    return out.select(
        id_col,
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
        F.md5(F.col("_enc")).alias("bpe_digest"),
    )
