"""BPE tokenizer: Spark trainer/encoder vs a pure-Python reference.

The reference implementation here is deliberately independent of the
Spark code (dict/Counter walk) — the same dual-implementation
discipline as the codec goldens.
"""

import collections

import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions import bpe


def py_train(texts, n_merges):
    wc = collections.Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: " ".join(list(w)) + " _" for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, c in wc.items():
            s = syms[w].split(" ")
            for i in range(len(s) - 1):
                pc[s[i] + " " + s[i + 1]] += c
        if not pc:
            break
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        m = pair.replace(" ", "")
        for w in syms:
            syms[w] = (
                (" " + syms[w] + " ").replace(" %s " % pair, " %s " % m).strip()
            )
    return merges


def py_encode(text, merges):
    s = " ".join(
        " ".join(list(w)) + " _" for w in text.split(" ") if w
    )
    for p in merges:
        s = (
            (" " + s + " ")
            .replace(" %s " % p, " %s " % p.replace(" ", ""))
            .strip()
        )
    return s


TEXTS = [
    "the fast the fast key",
    "the thin cat fast fat",
    "a a a aa theme fast",
    "keyed key the a",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_python_reference(spark, corpus):
    got = bpe.train_from_corpus(corpus, 8)
    assert got == py_train(TEXTS, 8)


def test_train_partition_invariant(spark, corpus):
    wc = bpe.word_counts(corpus)
    a = bpe.train(wc.repartition(1), 6)
    b = bpe.train(wc.repartition(7, "word"), 6)
    assert a == b == py_train(TEXTS, 6)


def test_encode_matches_python_reference(spark, corpus):
    merges = py_train(TEXTS, 8)
    rows = (
        corpus.select(
            "doc_id", bpe.encode_expr(F.col("text"), merges).alias("enc")
        )
        .orderBy("doc_id")
        .collect()
    )
    for r in rows:
        assert r["enc"] == py_encode(TEXTS[r["doc_id"]], merges)


def test_encode_docs_stats(spark, corpus):
    merges = py_train(TEXTS, 8)
    rows = {
        r["doc_id"]: r
        for r in bpe.encode_docs(corpus, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        toks = py_encode(t, merges).split(" ")
        assert rows[i]["n_bpe_tokens"] == len(toks)
        assert rows[i]["n_bpe_distinct"] == len(set(toks))


def test_no_cross_word_merges(spark):
    """'e _' may merge (word-final), but the flat doc string must
    never merge across the boundary between two words."""
    texts = ["be be be be ce", "ce be ce be be"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_from_corpus(df, 4)
    assert merges == py_train(texts, 4)
    row = df.select(
        bpe.encode_expr(F.col("text"), merges).alias("enc")
    ).collect()[0]
    # every word still ends with a _-terminated symbol; no token
    # contains _ anywhere but at its end
    for tok in row["enc"].split(" "):
        assert "_" not in tok[:-1]
        assert row["enc"] == py_encode(texts[0], merges)


def test_saturated_vocabulary_stops_early(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    # words are single chars: after 'x _' merges nothing remains
    merges = bpe.train_from_corpus(df, 50)
    assert len(merges) < 50
    assert merges == py_train(["a b c"], 50)
