"""Sharded corpus export: deterministic assignment, content-certifying
manifest, file stats, and layout-independence of the checksum."""

import os

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import layout


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, f"doc body {i} " * (1 + i % 3)) for i in range(n)],
        "doc_id bigint, text string",
    )


def test_export_writes_and_manifest_certifies(spark, tmpdir_path):
    docs = _docs(spark)
    out = os.path.join(tmpdir_path, "corpus")
    man = layout.export_shards(docs, out, "doc_id", 4, ["doc_id", "text"])
    rows = {r["shard"]: r for r in man.collect()}
    # every shard present, counts cover the corpus, files on disk
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in rows.values()) == 60
    for r in rows.values():
        assert r["n_files"] >= 1 and r["bytes"] > 0
        assert r["n_keys"] == r["n_rows"]  # doc_id unique
    # manifest from the written files == manifest from the source df
    src_man = {
        r["shard"]: r
        for r in layout.shard_manifest(
            docs, "doc_id", 4, ["doc_id", "text"]
        ).collect()
    }
    for s, r in rows.items():
        for c in ("n_rows", "n_keys", "min_key", "max_key", "checksum"):
            assert r[c] == src_man[s][c], (s, c)
    # written data round-trips exactly
    back = spark.read.parquet(out).drop("shard")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, docs.collect()))


def test_checksum_is_layout_independent(spark, tmpdir_path):
    docs = _docs(spark)
    a = layout.shard_manifest(docs, "doc_id", 4, ["doc_id", "text"])
    b = layout.shard_manifest(
        docs.repartition(13).sortWithinPartitions(F.desc("text")),
        "doc_id", 4, ["doc_id", "text"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_checksum_detects_content_change(spark):
    docs = _docs(spark)
    tampered = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    a = {r["shard"]: r["checksum"]
         for r in layout.shard_manifest(
             docs, "doc_id", 4, ["doc_id", "text"]).collect()}
    b = {r["shard"]: r["checksum"]
         for r in layout.shard_manifest(
             tampered, "doc_id", 4, ["doc_id", "text"]).collect()}
    bad = [s for s in a if a[s] != b[s]]
    # exactly the shard holding doc 7 differs
    assert len(bad) == 1


def test_assignment_is_stable_across_runs_and_plans(spark):
    docs = _docs(spark)
    k1 = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", layout.shard_key(F.col("doc_id"), 16).alias("s")
    ).collect()}
    k2 = {r["doc_id"]: r["s"] for r in docs.repartition(7).select(
        "doc_id", layout.shard_key(F.col("doc_id"), 16).alias("s")
    ).collect()}
    assert k1 == k2
    assert all(0 <= v < 16 for v in k1.values())
