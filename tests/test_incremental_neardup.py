"""Incremental near-dup (batch vs persisted MinHash band index).

The steady-state crawl-dedup shape: the corpus is indexed once; each
ingest batch shingles only itself, probes the index, and verifies by
exact Jaccard.  Covers: corpus matches, batch-internal matches, the
equivalence property vs a full-corpus LSH run restricted to pairs
touching the batch, the union-wide bucket cap, and no-match batches.
"""

import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import dedup

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text about spark engines here"),
    (4, "yet another unrelated document on cdc pipelines ok"),
]
BATCH = [
    (100, "the quick brown fox jumps over the lazy dog"),   # dup of 1
    (101, "the quick brown fox jumps over the lazy dog"),   # dup of 1+100
    (102, "nothing like anything in corpus whatsoever at all"),
]


def _dfs(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    return corpus, batch


def _run(spark, threshold=0.5, cap=None, batch_rows=None):
    corpus, batch = _dfs(spark)
    if batch_rows is not None:
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    index = dedup.minhash_bands(corpus)
    sets = dedup.shingle_sets(corpus)
    return dedup.incremental_neardup(
        batch, index, sets, threshold=threshold, max_bucket_size=cap
    ).collect()


def test_corpus_and_batch_matches(spark):
    rows = _run(spark)
    got = {(r.doc_new, r.doc_match, r.from_batch) for r in rows}
    assert (100, 1, False) in got
    assert (101, 1, False) in got
    assert (100, 101, True) in got and (101, 100, True) in got
    # near-dup (dog/cat) should verify too at 0.5 for these texts
    assert all(r.jaccard >= 0.5 for r in rows)
    assert not any(r.doc_new == 102 for r in rows)


def test_no_match_batch_is_empty(spark):
    rows = _run(
        spark,
        batch_rows=[(200, "zz yy xx ww vv uu tt ss rr qq")],
    )
    assert rows == []


def test_equivalence_with_full_corpus_run(spark):
    """incremental(batch vs corpus∪batch) ≡ full-corpus LSH+verify
    restricted to pairs touching the batch (both orientations)."""
    corpus, batch = _dfs(spark)
    alldocs = corpus.unionByName(batch)
    bands = dedup.minhash_bands(alldocs)
    pairs = dedup.lsh_candidate_pairs(bands)
    sets = dedup.shingle_sets(alldocs)
    full = dedup.verify_candidates(pairs, sets).where(
        F.col("jaccard") >= 0.5
    ).collect()
    batch_ids = {r[0] for r in BATCH}
    want = set()
    for r in full:
        if r.doc_a in batch_ids:
            want.add((r.doc_a, r.doc_b))
        if r.doc_b in batch_ids:
            want.add((r.doc_b, r.doc_a))
    got = {(r.doc_new, r.doc_match) for r in _run(spark)}
    assert got == want


def test_bucket_cap_is_union_wide(spark):
    # every doc identical -> each band bucket holds corpus+batch rows;
    # cap below that kills all candidates even though the batch alone
    # would fit (history-hot buckets stay capped for the batch)
    txt = "same same same same same same"
    corpus = spark.createDataFrame(
        [(i, txt) for i in range(10)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, txt), (101, txt)], "doc_id long, text string"
    )
    index = dedup.minhash_bands(corpus)
    sets = dedup.shingle_sets(corpus)
    capped = dedup.incremental_neardup(
        batch, index, sets, max_bucket_size=5
    ).collect()
    assert capped == []
    uncapped = dedup.incremental_neardup(batch, index, sets).collect()
    assert {(r.doc_new, r.doc_match) for r in uncapped} >= {
        (100, 101), (101, 100), (100, 0), (101, 0)
    }


def test_short_docs_never_match(spark):
    corpus, _ = _dfs(spark)
    rows = _run(spark, batch_rows=[(300, "too short")])  # < 3 tokens
    assert rows == []


def test_jaccard_values_exact(spark):
    rows = _run(spark)
    by_pair = {(r.doc_new, r.doc_match): r.jaccard for r in rows}
    assert by_pair[(100, 1)] == pytest.approx(1.0)
    # dog vs cat: 7 shared of 7+7 distinct 3-shingles -> 6/8
    sh_all = 7  # 9 tokens -> 7 shingles, all distinct
    shared = 6  # last shingle differs ('the lazy dog' vs cat + prior)
    j = by_pair.get((100, 2))
    if j is not None:
        inter_over_union = shared / (2 * sh_all - shared)
        assert j == pytest.approx(inter_over_union)
