"""Shuffle-free Bloom decontamination: correctness vs the exact join
variant (FPs may only inflate, never deflate), flagging behavior, and
the no-shuffle plan guarantee on the corpus scan."""

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import dedup

EVAL = [
    (1000, "what is the capital of france paris obviously"),
    (1001, "solve for x in two x plus three equals seven"),
]
CORPUS = [
    (1, "what is the capital of france paris obviously"),        # leak
    (2, "the capital of france paris obviously is a question"),  # partial
    (3, "totally unrelated text about spark physical plans here"),
    (4, "solve for x in two x plus three equals seven exactly"),  # leak+
]


def _dfs(spark):
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    cp = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return cp, ev


def test_flags_leaked_docs(spark):
    cp, ev = _dfs(spark)
    rows = {
        r.doc_id: r
        for r in dedup.decontaminate_bloom(cp, ev, threshold=0.5).collect()
    }
    assert rows[1].flagged and rows[4].flagged
    assert not rows[3].flagged
    assert rows[1].overlap_ratio == 1.0


def test_never_undercounts_vs_exact(spark):
    """Bloom overlap >= exact overlap for every doc (false positives
    only inflate — the conservative direction)."""
    cp, ev = _dfs(spark)
    exact = {
        r.doc_id: r.n_overlap
        for r in dedup.decontaminate(cp, ev, threshold=0.5).collect()
    }
    bloom = {
        r.doc_id: r.n_overlap_bloom
        for r in dedup.decontaminate_bloom(cp, ev, threshold=0.5).collect()
    }
    assert set(bloom) == set(exact)
    for did in exact:
        assert bloom[did] >= exact[did]


def test_exact_at_low_fill(spark):
    """At this fill factor (~6 eval shingles in 8192 bits) the FP
    probability is ~0 — counts should equal the exact variant."""
    cp, ev = _dfs(spark)
    exact = {
        r.doc_id: r.n_overlap
        for r in dedup.decontaminate(cp, ev, threshold=0.5).collect()
    }
    bloom = {
        r.doc_id: r.n_overlap_bloom
        for r in dedup.decontaminate_bloom(cp, ev, threshold=0.5).collect()
    }
    assert bloom == exact


def test_corpus_scan_has_no_shuffle(spark):
    cp, ev = _dfs(spark)
    out = dedup.decontaminate_bloom(cp, ev)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_zero_shingle_docs_excluded(spark):
    cp = _dfs(spark)[1]  # reuse eval as corpus
    short = cp.sparkSession.createDataFrame(
        [(9, "hi")], "doc_id long, text string"
    )
    rows = dedup.decontaminate_bloom(short, cp).collect()
    assert rows == []
