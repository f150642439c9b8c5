"""Deterministic Bloom filter as a DataFrame aggregate.

The join-pruning workhorse at 100 TB: build a fixed-size bitset over
the SMALL side's join key, broadcast it, and drop the big side's
non-matching rows BEFORE the shuffle — the poor man's runtime filter
(Spark's own runtime bloom only kicks in for equi-joins it can see;
this one composes with any downstream operator, e.g. pruning a decode
stage by a dimension's key set).

Same determinism discipline as the rest of the repo: bit positions
come from md5 (portable), the bitset is an integer ``bit_or``
aggregate over 32-bit words (mergeable, map-side combined,
order-independent — a word is identical no matter how rows were
partitioned), and membership is pure integer bit arithmetic, so an
external engine reproduces the filter AND every probe verdict
bit-for-bit.  False positives are a measured property (emit the rate,
never silent); false negatives are impossible by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WORD_BITS = 32


def _pow2(bit: Column) -> Column:
    """2^bit as a bigint for bit < 32 — pyspark's shiftleft wants a
    literal shift amount, but powers of two are EXACT in doubles
    (only the exponent moves), so pow is bit-safe here."""
    return F.pow(F.lit(2.0), bit.cast("double")).cast("long")


def _positions(val: Column, n_bits: int, k: int) -> Column:
    """Array of k bit positions for a value: first 48 md5 bits of
    ``value ':' seed`` modulo n_bits."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            val.cast("string"), F.lit(f":{i}")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % n_bits
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, col: str, n_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Build the filter: (word, bits) rows, one per non-empty 32-bit
    word — at most n_bits/32 rows regardless of input size, the
    broadcastable sketch of the key set."""
    pos = F.explode(_positions(F.col(col), n_bits, k)).alias("_p")
    return (
        df.select(pos)
        .select(
            (F.col("_p") / _WORD_BITS).cast("long").alias("word"),
            _pow2(F.col("_p") % _WORD_BITS).alias("_b"),
        )
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_words(bloom: DataFrame, n_bits: int = 4096) -> list[int]:
    """Collect the filter into a dense word list (missing words = 0).
    Bounded BY CONSTRUCTION at n_bits/32 longs (128 for the default
    4 KiB filter) — the same scalar-broadcast discipline as the
    commit-watermark gate, not a data-sized collect."""
    dense = [0] * (n_bits // _WORD_BITS)
    for r in bloom.collect():
        dense[int(r["word"])] = int(r["bits"])
    return dense


def bloom_might_contain(
    val: Column, words: list[int], n_bits: int = 4096, k: int = 3
) -> Column:
    """Pure-expression membership test against a literal word list —
    a per-row integer map with NO join and NO shuffle (the point of a
    runtime filter: the big side is pruned where it sits).  False
    negatives impossible; false-positive rate ≈ (1−e^{−kn/m})^k."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for i in range(k):
        p = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(val.cast("string"), F.lit(f":{i}"))
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % n_bits
        )
        word = F.element_at(
            arr, ((p / _WORD_BITS).cast("int") + 1)
        )
        bit = p % _WORD_BITS
        # (word div 2^bit) mod 2 — division by a power of two is
        # exact in doubles, so this IS the bit test
        cond = cond & (
            F.floor(word / _pow2(bit)).cast("long") % 2 == 1
        )
    return cond


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    n_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` MIGHT be in the set the
    filter was built from (no false negatives, no shuffle of df)."""
    words = bloom_words(bloom, n_bits)
    return df.where(
        bloom_might_contain(F.col(col), words, n_bits, k)
    )
