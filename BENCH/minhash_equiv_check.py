#!/usr/bin/env python3
"""Byte-identity check for the long-domain MinHash signature agg.

Compares dedup.minhash_bands against an inline replica of the prior
string-domain aggregation (min over the 8-char hex substrings) with
exceptAll in BOTH directions, on a full testdata documents table —
the same discipline as the round-6 explode-form proof.  Also checks
incremental_neardup output against an inline replica of the
union-sa verify join (before the batch-only sa restriction).

Usage: python BENCH/minhash_equiv_check.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import dedup, textops
from pg_pb3_ld_spark.session import build_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def old_minhash_bands(docs, text_col="text", id_col="doc_id", k=4, shingle_n=3):
    """Round-start shape: min over hex substrings (string domain)."""
    toks = textops.tokens(F.col(text_col))
    sh = textops.shingles(toks, shingle_n)
    hashed = docs.select(id_col, F.explode(sh).alias("_s")).select(
        id_col, F.md5("_s").alias("_h")
    )
    sig = hashed.groupBy(id_col).agg(
        *[
            F.min(F.substring("_h", 1 + 8 * j, 8)).alias(f"mh{j}")
            for j in range(k)
        ]
    )
    return sig.select(
        id_col,
        F.posexplode_outer(
            F.array(*[F.col(f"mh{j}") for j in range(k)])
        ).alias("band_id", "bk"),
    )


def main():
    spark = build_session(
        app_name="minhash-equiv", master="local[16]", shuffle_partitions=16
    )
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    new = dedup.minhash_bands(docs)
    old = old_minhash_bands(docs)
    d1 = new.exceptAll(old).count()
    d2 = old.exceptAll(new).count()
    print(f"bands new\\old={d1} old\\new={d2}")
    assert d1 == 0 and d2 == 0, "minhash_bands NOT byte-identical"

    # incremental_neardup: current operator vs an inline replica that
    # uses the pre-change union sa side
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where(F.col("doc_id") % 3 == 0)
    ib = dedup.minhash_bands(corpus)
    cs = dedup.shingle_sets(corpus)
    cur = dedup.incremental_neardup(batch, ib, cs, threshold=0.5)

    nb = dedup.minhash_bands(batch).withColumn("_new", F.lit(True))
    ib2 = ib.select("doc_id", "band_id", "bk").withColumn("_new", F.lit(False))
    capped = ib2.unionByName(nb)
    a = capped.where(F.col("_new")).alias("a")
    b = capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_new"),
            F.col("b.doc_id").alias("doc_match"),
            F.col("b._new").alias("from_batch"),
        )
        .distinct()
    )
    sets = cs.unionByName(dedup.shingle_sets(batch))
    sa = sets.select(F.col("doc_id").alias("doc_new"), F.col("shs").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_match"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    ref = (
        cand.join(sa, "doc_new")
        .join(sb, "doc_match")
        .select(
            "doc_new", "doc_match", (inter / union).alias("jaccard"),
            "from_batch",
        )
        .where(F.col("jaccard") >= 0.5)
    )
    d3 = cur.exceptAll(ref).count()
    d4 = ref.exceptAll(cur).count()
    print(f"incremental cur\\ref={d3} ref\\cur={d4}")
    assert d3 == 0 and d4 == 0, "incremental_neardup NOT identical"
    print("OK: byte-identical on", SF)
    spark.stop()


if __name__ == "__main__":
    main()
