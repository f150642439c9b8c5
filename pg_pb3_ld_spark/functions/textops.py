"""Text-analysis / dedup primitives for training-data pipelines.

Everything is built from whitespace tokens and md5 (the one hash both
Spark and DuckDB implement identically), so every operator here has
an exact cross-engine oracle.  All expressions are pure Catalyst —
higher-order array functions, no Python UDFs.

Operators:
* ``tokens`` / ``shingles``       — tokenization, word n-gram shingles
* ``minhash_signature``           — K-permutation MinHash via
  ``min(md5(seed ∥ shingle)))`` (lexicographic min of md5 strings is
  a valid min-wise hash family)
* ``lsh_band``                    — banded signature bucket for LSH
  candidate generation (shuffle-friendly: candidates come from a
  groupBy on the band key, never an all-pairs join)
* ``simhash16``                   — 16-bit SimHash from md5 nibbles
* ``stopword_ratio`` (lang-id), ``quality_score``, ``fingerprint``
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "les"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles: ``array_join(slice(toks, i, n))`` for
    i in 1..len-n+1 (empty array when the doc is shorter than n)."""
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def md5_array(shingle_col: Column) -> Column:
    """One md5 digest per shingle — compute ONCE, then slice K
    signature components out of it (``minhash_from_md5``).  Keeping
    the md5 pass in its own projection matters: higher-order lambdas
    run interpreted (no whole-stage codegen), so md5-per-shingle is
    the dominant cost of the signature and must not be duplicated by
    projection collapse (see dedup.minhash_bands' shuffle barrier)."""
    # NB: must be a 1-arg lambda — a 2-arg lambda (even with a
    # default) makes pyspark's transform() pass the array INDEX
    # as the second argument
    return F.transform(shingle_col, lambda s: F.md5(s))


def minhash_from_md5(md5s: Column, k: int = 4) -> list[Column]:
    """K min-wise hashes from per-shingle md5 digests: component j is
    the lexicographic minimum of the j-th 8-hex-char (32-bit) slice —
    disjoint slices of one digest are independent hash functions, so
    one md5 per shingle serves all K permutations (k ≤ 4)."""
    if k > 4:
        raise ValueError("md5 yields 4 disjoint 32-bit slices (k <= 4)")

    def slicer(start: int):
        # 1-arg lambda only (2-arg transform lambdas receive the index)
        return lambda h: F.substring(h, start, 8)

    return [
        F.array_min(F.transform(md5s, slicer(1 + 8 * j))).alias(f"mh{j}")
        for j in range(k)
    ]


def minhash_signature(shingle_col: Column, k: int = 4) -> list[Column]:
    """K min-wise hashes over a doc's shingle array (convenience
    composition of ``md5_array`` + ``minhash_from_md5`` — use the two
    pieces separately with a barrier when the plan matters)."""
    return minhash_from_md5(md5_array(shingle_col), k)


def lsh_band(sig_cols: list[Column | str], band: int, rows_per_band: int = 2) -> Column:
    """Band key: md5 over the band's signature rows; docs sharing a
    band key are near-dup candidates."""
    cols = [
        F.col(c) if isinstance(c, str) else c
        for c in sig_cols[band * rows_per_band : (band + 1) * rows_per_band]
    ]
    return F.md5(F.concat_ws("|", *cols))


def simhash16(toks: Column) -> list[Column]:
    """Per-dimension SimHash vote columns (to be summed per doc):
    dimension j votes +1 if the j-th md5 nibble of the token is >= 8.

    Returns 16 vote columns for an exploded-token DataFrame."""
    votes = []
    for j in range(16):
        nib = F.substring(F.md5(toks), j + 1, 1)
        votes.append(
            F.when(nib >= "8", 1).otherwise(-1).alias(f"v{j}")
        )
    return votes


def stopword_ratio(toks: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang`` — the
    n-gram-free language-ID heuristic."""
    sw = STOPWORDS[lang]
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in sw]))
    )
    # truncate (not round): round-half behavior differs across
    # engines; floor of identical doubles is engine-independent
    return F.floor(hits / F.greatest(F.size(toks), F.lit(1)) * 10000) / 10000


def quality_score(text: Column, toks: Column) -> Column:
    """Deterministic quality heuristic: type-token ratio × mean token
    length, clamped — a stand-in for classifier-based scoring with an
    exact SQL oracle."""
    n = F.greatest(F.size(toks), F.lit(1))
    ttr = F.size(F.array_distinct(toks)) / n
    mean_len = F.length(text) / n
    return F.floor(F.least(ttr * mean_len / 8.0, F.lit(1.0)) * 10000) / 10000


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the lowercase text prefix + length
    class — cheap near-exact dedup key."""
    # floor() before the int cast: DuckDB rounds double→int while
    # Spark truncates, floor makes both engines agree
    return F.concat(
        F.md5(F.lower(F.substring(text, 1, 64))),
        F.lit(":"),
        F.floor(F.length(text) / 100).cast("int").cast("string"),
    )


def repetition_signals(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    public paper): the fraction of a document occupied by repeated
    word n-grams — the staple filter for boilerplate/spam in LLM
    training corpora (alongside ``quality_score``'s length/TTR
    heuristics).

    Per document, over whitespace tokens:

    * ``n_2grams`` / ``top_2gram_count`` / ``top_2gram_frac`` — total
      2-gram occurrences, the most frequent 2-gram's count, and its
      fraction (repeated headers/boilerplate push this up);
    * ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of n-gram
      occurrences beyond each gram's first (Σ(c−1)/Σc).

    Scale shape: n-grams come from pure-Catalyst array slices
    (``shingles``), then ONE explode + two hash aggregations per n —
    counts get map-side partial aggregation, so the shuffle carries
    (doc, gram, partial-count), not raw occurrences; the per-doc
    rollup and final join shuffle on ``doc_id`` only.  No windows, no
    UDFs, no driver state — the same discipline as ``minhash_lsh``.
    Fractions are floor-truncated to 4 decimals (cross-engine-stable,
    see ``stopword_ratio``).
    """
    from pyspark.sql import DataFrame  # noqa: F401  (doc typing only)

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), F.size(toks).alias("n_tokens"), toks.alias("_t")
    )

    def gram_stats(n: int, prefix: str):
        g = base.select(
            id_col, F.explode(shingles(F.col("_t"), n)).alias("_g")
        )
        counts = g.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
        return counts.groupBy(id_col).agg(
            F.sum("_c").alias(f"n_{prefix}grams"),
            F.max("_c").alias(f"top_{prefix}gram_count"),
            F.sum(F.col("_c") - 1).alias(f"_dup_{prefix}"),
        )

    a2 = gram_stats(2, "2")
    a3 = gram_stats(3, "3").select(
        id_col, F.col("n_3grams").alias("_n3"), "_dup_3"
    )

    def frac(num, den):
        return F.when(
            den > 0, F.floor(num / den * 10000) / 10000
        ).otherwise(F.lit(0.0))

    return (
        base.select(id_col, "n_tokens")
        .join(a2, id_col, "left")
        .join(a3, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_2grams", F.lit(0)).alias("n_2grams"),
            F.coalesce("top_2gram_count", F.lit(0)).alias("top_2gram_count"),
            frac(F.col("top_2gram_count"), F.col("n_2grams"))
                .alias("top_2gram_frac"),
            frac(F.col("_dup_2"), F.col("n_2grams")).alias("dup_2gram_frac"),
            frac(F.col("_dup_3"), F.col("_n3")).alias("dup_3gram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing + URL/domain analysis (training-data compliance staples)
# ---------------------------------------------------------------------------

# Patterns restricted to the regex intersection of Java (Spark) and
# RE2 (DuckDB): char classes, bounded quantifiers, alternation, \b —
# NO lookaround, NO backrefs — so the exact same pattern string runs
# on both engines and the scrub is cross-engine byte-identical.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # order matters: SSN (3-2-4) before phone (3-3-4) keeps the
    # classes disjoint on shared separators
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}

URL_PATTERN = r"https?://[A-Za-z0-9.-]+[A-Za-z0-9./_%+-]*"
DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def pii_scrub(df, id_col: str = "doc_id", text_col: str = "text"):
    """Redact emails / IPv4s / SSNs / phone numbers with typed
    placeholder tokens and count each category (size of
    ``regexp_extract_all`` — identical semantics on DuckDB, so the
    whole operator has an exact SQL oracle).

    Scale shape: a pure per-row Catalyst projection — no shuffle, no
    UDFs, whole-stage codegen end-to-end; at 100 TB this is a
    map-only pass that pushes column pruning into the scan.
    Counting runs BEFORE redaction; replacement applies the patterns
    in ``PII_PATTERNS`` order on the running text so earlier
    redactions can't be double-counted by later patterns.
    """
    text = F.col(text_col)
    cols = [F.col(id_col)]
    scrubbed = text
    for name, (pat, token) in PII_PATTERNS.items():
        cols.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .alias(f"n_{name}"),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    cols.append(scrubbed.alias("scrubbed"))
    return df.select(*cols)


def domain_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-level URL-domain frequency table: extract every
    ``http(s)://`` URL, keep its host, aggregate (domain →
    n_urls, n_docs).  The per-corpus URL/domain census every web
    training pipeline runs before domain-level filtering/sampling.

    Scale shape: regexp_extract_all + ONE explode, then a hash
    aggregation with map-side combine on ``domain`` — the shuffle
    carries (domain, partial count, partial distinct-doc sketch),
    never raw URLs.  ``n_docs`` uses count(distinct) over the
    (domain, doc) pre-dedup — expressed as two stacked aggs so both
    stay HashAggregates.
    """
    urls = df.select(
        F.col(id_col).alias("_doc"),
        F.explode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
        ).alias("_url"),
    ).where(F.col("_url").isNotNull())
    per_doc = urls.select(
        "_doc",
        F.regexp_extract("_url", DOMAIN_PATTERN, 1).alias("domain"),
    ).groupBy("domain", "_doc").agg(F.count("*").alias("_c"))
    return per_doc.groupBy("domain").agg(
        F.sum("_c").alias("n_urls"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# SFT sample construction: chat-template rendering + sequence packing
# ---------------------------------------------------------------------------

def render_chat(df, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                role_col: str = "role", text_col: str = "text",
                sep: str = "\n"):
    """Render multi-turn conversations into training strings: per
    conversation, turns sorted by ``turn_idx`` and concatenated as
    ``<|role|>text`` — the deterministic chat-template step every
    SFT pipeline runs before tokenization.  Returns (conv_id,
    n_turns, rendered_chars, digest) with ``digest = md5(rendered)``
    so correctness pins the exact byte sequence, not just lengths.

    Scale shape: ONE hash-partitioned groupBy on ``conv_id`` with
    bounded group size (turns per conversation); ``collect_list`` +
    ``array_sort`` keeps ordering deterministic regardless of
    partitioning — no global window, no driver state.
    """
    turn = F.struct(
        F.col(turn_col).alias("i"),
        F.col(role_col).alias("r"),
        F.col(text_col).alias("t"),
    )
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(turn)),
            lambda x: F.concat(
                F.lit("<|"), x["r"], F.lit("|>"), x["t"]
            ),
        ),
        sep,
    )
    return (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            rendered.alias("_rendered"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.length("_rendered").alias("rendered_chars"),
            F.md5("_rendered").alias("digest"),
        )
    )


def pack_sequences(df, budget: int, shard_col: str = "shard",
                   id_col: str = "doc_id", tokens_col: str = "n_tokens"):
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): within each shard, documents are laid head-to-tail in
    ``id_col`` order and the token stream is cut every ``budget``
    tokens.  Emits each document's span: its start offset in the
    shard's token stream and the first/last chunk it lands in.

    Scale shape: ONE window per shard partition (cumulative sum,
    ROWS UNBOUNDED PRECEDING) — the shard is the parallel unit, so
    at 100 TB you shard first (split/bucket) and every shard's
    packing is an independent partition-local scan; there is no
    global ordering anywhere.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    incl = F.sum(tokens_col).over(w)
    start = (incl - F.col(tokens_col)).alias("start_tok")
    first = F.floor((incl - F.col(tokens_col)) / budget)
    last = F.floor((incl - 1) / budget)
    return df.select(
        id_col,
        shard_col,
        tokens_col,
        start,
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        (last - first + 1).cast("long").alias("n_chunks"),
    )


def lm_bigram_scores(df, id_col: str = "doc_id", text_col: str = "text",
                     add_k: float = 1.0):
    """Bigram language-model scoring (KenLM-style quality signal,
    self-trained): train add-k-smoothed bigram counts over the whole
    corpus, then score every document by the mean negative log
    probability of its bigrams — low = fluent/common phrasing, high =
    noise.  This is the classic "perplexity filter" of web-scale
    pretraining pipelines (CCNet et al.), expressed entirely in
    Catalyst:

    * unigram/bigram counts: two hash aggregates over exploded
      tokens (map-side partial combine collapses repeats before the
      shuffle — the same skew story as the CDC fold);
    * p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V) with V = |vocab|;
    * doc score: one shuffle join of the doc's bigrams against the
      bigram-count table keyed (w1,w2), plus a join on w1 for the
      denominator; both are plain shuffle hash joins that scale out
      (at 100 TB, train counts on a sample and broadcast the top-K
      table instead — same plan shape, smaller build side).

    Output: (id_col, n_bigrams, avg_nll, ppl); single-token and
    empty documents drop out (no bigrams to score).
    """
    toks = tokens(F.col(text_col))
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    uni = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni_counts.select(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    bi_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )

    scored = (
        pairs.join(bi_counts, ["w1", "w2"], "left")
        .join(uni_counts.withColumnRenamed("w", "w1"), "w1", "left")
        .join(vocab)
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(add_k))
                    / (F.coalesce(F.col("c1"), F.lit(0))
                       + F.lit(add_k) * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nll").alias("avg_nll"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


def overlap_chunks(
    docs: DataFrame, size: int = 64, stride: int = 48,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping context-window chunking (the RAG / long-doc
    pretraining splitter): token windows of ``size`` starting every
    ``stride`` tokens, last window anchored so every token is covered
    → (id, chunk_idx, start_tok, n_tok, chunk_text).

    Pure Catalyst: one ``sequence`` + ``posexplode`` per doc, the
    window text a ``slice``+``array_join`` — no shuffle, no Python;
    output rows ∝ tokens/stride.  ``stride < size`` gives the overlap
    that keeps boundary-spanning context retrievable."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - size, F.lit(0)) + stride - 1) / stride
        ).cast("int")
    )
    base = docs.select(
        id_col, toks.alias("_t"),
        F.sequence(F.lit(0), n_chunks - 1).alias("_ks"),
    ).where(n > 0)
    start = F.col("_k") * stride
    win = F.slice(F.col("_t"), start + 1, size)
    return base.select(
        id_col, F.posexplode("_ks").alias("chunk_idx", "_k"), "_t"
    ).select(
        id_col,
        "chunk_idx",
        start.cast("int").alias("start_tok"),
        F.size(win).cast("int").alias("n_tok"),
        F.array_join(win, " ").alias("chunk_text"),
    )


def transcript_qa(
    df: DataFrame, conv_col: str = "conv_id", turn_col: str = "turn_idx",
    role_col: str = "role", text_col: str = "text",
) -> DataFrame:
    """Per-conversation transcript integrity report — the QA gate an
    SFT pipeline runs before rendering/packing (the transcripts table
    is the payload this engine ingests; reference analog: the decoded
    per-row stream of ``pg_pb3_ld.c:300-334``, whose consumers must
    validate turn structure themselves).

    Turns are canonically ordered by ``(turn_idx, role, is_empty)``
    (a total order on the fields the checks read, so the report is
    deterministic under any partitioning even with duplicate
    turn_idx).  Per conversation:

    * ``has_gap``         — turn_idx does not cover 0..n_distinct-1
    * ``has_dup_idx``     — duplicate turn_idx values
    * ``role_violations`` — adjacent turns with the same role, plus a
      conversation opening with a role other than system/user
    * ``orphan_tools``    — 'tool' turns not immediately preceded by
      an 'assistant' turn (incl. a tool turn opening the conversation)
    * ``empty_turns``     — null/empty text
    * ``ok``              — all of the above clean

    Scale shape: ONE hash-partitioned groupBy on ``conv_col`` with
    bounded group size (turns per conversation); ordering + every
    check run as array expressions inside the aggregate — no window,
    no Python, no second shuffle."""
    turn = F.struct(
        F.col(turn_col).cast("int").alias("i"),
        F.col(role_col).alias("r"),
        (F.col(text_col).isNull() | (F.col(text_col) == "")).alias("e"),
    )
    agg = df.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.array_sort(F.collect_list(turn)).alias("_a")
    )
    a = F.col("_a")
    n = F.size(a)
    first = a[0]
    idxs = F.transform(a, lambda x: x["i"])
    ndist = F.size(F.array_distinct(idxs))
    # adjacent (prev, cur) role pairs over the canonical order
    pairs = F.zip_with(
        F.slice(a, 1, n - 1),
        F.slice(a, 2, n - 1),
        lambda p, c: F.struct(p["r"].alias("pr"), c["r"].alias("cr")),
    )
    role_viol = (
        F.size(F.filter(pairs, lambda x: x["pr"] == x["cr"]))
        + F.when(first["r"].isin("system", "user"), F.lit(0)).otherwise(
            F.lit(1)
        )
    )
    orphan = (
        F.size(
            F.filter(
                pairs,
                lambda x: (x["cr"] == "tool") & (x["pr"] != "assistant"),
            )
        )
        + F.when(first["r"] == "tool", F.lit(1)).otherwise(F.lit(0))
    )
    empty_ct = F.size(F.filter(a, lambda x: x["e"]))
    has_gap = ~((first["i"] == 0) & (F.element_at(a, -1)["i"] == ndist - 1))
    has_dup = ndist != n
    return agg.select(
        "conv_id",
        n.cast("int").alias("n_turns"),
        has_gap.alias("has_gap"),
        has_dup.alias("has_dup_idx"),
        role_viol.cast("int").alias("role_violations"),
        orphan.cast("int").alias("orphan_tools"),
        empty_ct.cast("int").alias("empty_turns"),
        (
            ~has_gap
            & ~has_dup
            & (role_viol == 0)
            & (orphan == 0)
            & (empty_ct == 0)
        ).alias("ok"),
    )


def tool_flow(
    df: DataFrame, conv_col: str = "conv_id", turn_col: str = "turn_idx",
    role_col: str = "role", tool_col: str = "tool",
) -> DataFrame:
    """Behavioral dedup of agent transcripts: fingerprint each
    conversation by its ORDERED action sequence — the ``role:tool``
    string of every turn in turn order — and group conversations with
    identical flows.  Text-level dedup (MinHash/SemDeDup) misses
    agent episodes that differ in wording but replay the same tool
    trajectory; training on thousands of behaviorally identical
    episodes over-weights one policy path, so the flow fingerprint is
    the dedup key that actually matches how agent data repeats.
    (The transcripts table is the payload this engine ingests;
    reference analog: the decoded per-row stream of
    ``pg_pb3_ld.c:300-334`` — flow analysis is downstream-consumer
    logic the reference leaves to its users.)

    Output per conversation: ``n_turns``, ``n_tool_turns``,
    ``flow_sig`` (md5 of the canonical sequence — portable, DuckDB
    replays it byte-for-byte), ``flow_count`` (behavioral-cluster
    size), ``canonical_conv`` (min conv in the cluster),
    ``is_canonical`` (the dedup survivor rule).

    Scale shape: one hash groupBy on the conversation (bounded group
    size = turns per conversation, sequence built as array
    expressions — no window, no Python), one groupBy on the
    fingerprint (rows = conversations, map-side combined), and a
    fingerprint-keyed join back.  No all-pairs anything: identical
    flows collide on an md5 key exactly like exact-dedup."""
    item = F.struct(
        F.col(turn_col).cast("int").alias("i"),
        F.col(role_col).alias("r"),
        F.coalesce(F.col(tool_col), F.lit("")).alias("t"),
    )
    per = df.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.array_sort(F.collect_list(item)).alias("_seq")
    )
    seq = F.col("_seq")
    sig = per.select(
        "conv_id",
        F.size(seq).cast("long").alias("n_turns"),
        F.size(F.filter(seq, lambda x: x["r"] == "tool"))
        .cast("long")
        .alias("n_tool_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    seq, lambda x: F.concat(x["r"], F.lit(":"), x["t"])
                ),
                "|",
            )
        ).alias("flow_sig"),
    )
    grp = sig.groupBy("flow_sig").agg(
        F.count(F.lit(1)).cast("long").alias("flow_count"),
        F.min("conv_id").alias("canonical_conv"),
    )
    return sig.join(grp, "flow_sig").select(
        "conv_id",
        "n_turns",
        "n_tool_turns",
        "flow_sig",
        "flow_count",
        (F.col("conv_id") == F.col("canonical_conv")).alias("is_canonical"),
        "canonical_conv",
    )


def branch_paths(
    df, conv_col: str = "conv_id", node_col: str = "node_id",
    parent_col: str = "parent_id", max_rounds: int = 32,
    checkpoint_every: int = 4, score_col: str | None = None,
):
    """Root-to-leaf path reconstruction over BRANCHED conversations —
    regenerations/edits give a turn multiple children, so a stored
    transcript is a tree of turns (parent pointers), and every
    training sample is one root→leaf path through it.  (The
    transcripts table is the payload this engine ingests; reference
    analog: the decoded per-row stream of ``pg_pb3_ld.c:300-334`` —
    tree linearization is downstream-consumer logic the reference
    leaves to its users.)

    Pointer doubling (parallel list ranking): each node carries
    ``(jump, path)`` — initially ``(parent, [node])`` — and every
    round folds its jump target's state in: ``path ∥= path(jump)``,
    ``jump = jump(jump)``.  Depth-d chains terminate in ⌈log2 d⌉
    rounds (the same O(log) discipline as
    ``dedup.connected_components``), each round ONE shuffle join on
    ``(conv, node)``.  A dangling parent pointer terminates the walk
    at the dangler (``transcript_qa`` is the integrity gate for
    that); a parent CYCLE would never terminate, so exhausting
    ``max_rounds`` raises rather than returning partial paths.

    Returns one row per LEAF (a node no other node claims as parent):
    ``(conv_id, leaf_id, depth, path)`` with ``path`` the root→leaf
    node ids joined by '/'.

    When ``score_col`` is given, a per-path score total rides the
    SAME doubling state (``score ∥ path``, one more long per node —
    no extra pass, no explode-and-rejoin): the output gains
    ``total_score`` = the exact integer sum of the scores along the
    root→leaf path.

    Scale shape: ⌈log2 depth⌉ self-joins on the (conv, node) key +
    one anti-join for leaves; path arrays are bounded by conversation
    depth; lineage is truncated by ``localCheckpoint`` every
    ``checkpoint_every`` rounds exactly like the CC loop."""
    init = [
        F.col(conv_col).cast("long").alias("conv_id"),
        F.col(node_col).cast("long").alias("node_id"),
        F.col(parent_col).cast("long").alias("_jump"),
        F.array(F.col(node_col).cast("long")).alias("_path"),
    ]
    if score_col is not None:
        init.append(F.col(score_col).cast("long").alias("_ps"))
    state = df.select(*init)
    done = False
    prev = None
    for rnd in range(max_rounds):
        # persist each round and run the termination scan over the
        # cache (full count, not limit(1) — a short-circuited limit
        # would leave partitions unmaterialized and the parent
        # unpersist below would force the whole join chain to
        # recompute, the O(rounds²) shape this loop had before r6);
        # per-round work is then one cached join, like the CC loop
        state = state.persist()
        n_unsettled = state.where(F.col("_jump").isNotNull()).count()
        if prev is not None:
            prev.unpersist()
            prev = None
        if n_unsettled == 0:
            done = True
            break
        rcols = [
            F.col("conv_id").alias("_rc"),
            F.col("node_id").alias("_rn"),
            F.col("_jump").alias("_rjump"),
            F.col("_path").alias("_rpath"),
        ]
        if score_col is not None:
            rcols.append(F.col("_ps").alias("_rps"))
        right = state.select(*rcols)
        joined = state.join(
            right,
            (F.col("conv_id") == F.col("_rc"))
            & (F.col("_jump") == F.col("_rn")),
            "left",
        )
        settled = F.col("_jump").isNull() | F.col("_rn").isNull()
        fold = [
            "conv_id",
            "node_id",
            F.when(settled, F.lit(None).cast("long"))
            .otherwise(F.col("_rjump"))
            .alias("_jump"),
            F.when(settled, F.col("_path"))
            .otherwise(F.concat(F.col("_path"), F.col("_rpath")))
            .alias("_path"),
        ]
        if score_col is not None:
            fold.append(
                F.when(settled, F.col("_ps"))
                .otherwise(F.col("_ps") + F.col("_rps"))
                .alias("_ps")
            )
        new_state = joined.select(*fold)
        if (rnd + 1) % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=False)
        prev, state = state, new_state
    if not done and state.where(
        F.col("_jump").isNotNull()
    ).limit(1).count() > 0:
        raise RuntimeError(
            f"branch_paths: parent chains not settled after "
            f"{max_rounds} doubling rounds (depth > 2^{max_rounds} "
            "or a parent-pointer cycle)"
        )
    parents = df.where(F.col(parent_col).isNotNull()).select(
        F.col(conv_col).cast("long").alias("conv_id"),
        F.col(parent_col).cast("long").alias("node_id"),
    ).distinct()
    leaves = state.join(parents, ["conv_id", "node_id"], "left_anti")
    out = [
        "conv_id",
        F.col("node_id").alias("leaf_id"),
        F.size("_path").cast("int").alias("depth"),
        F.array_join(
            F.transform(F.reverse("_path"), lambda x: x.cast("string")),
            "/",
        ).alias("path"),
    ]
    if score_col is not None:
        out.append(F.col("_ps").alias("total_score"))
    return leaves.select(*out)


def best_paths(
    df, conv_col: str = "conv_id", node_col: str = "node_id",
    parent_col: str = "parent_id", score_col: str = "score",
    max_rounds: int = 32,
):
    """Best-trajectory selection (rejection sampling over regenerated
    conversation trees): of every root→leaf path, keep the one with
    the MAXIMUM total turn score per conversation — the SFT/
    process-reward staple downstream of :func:`branch_paths`.

    The per-path score total rides the pointer-doubling state (no
    explode-and-rejoin), and the winner is picked with the same
    SortAggregate-proof two-pass ranking as ``preference_pairs``:
    ``max(total)`` (pass 1), then ``min(leaf) FILTER (total = max)``
    (pass 2) — deterministic under any partitioning, no window, no
    packed-bigint range assumption on scores.

    Output: one row per conversation —
    ``(conv_id, leaf_id, depth, path, total_score, n_paths)``."""
    paths = branch_paths(
        df, conv_col, node_col, parent_col,
        max_rounds=max_rounds, score_col=score_col,
    )
    paths = paths.localCheckpoint(eager=True)  # reused three times
    best = paths.groupBy("conv_id").agg(
        F.max("total_score").alias("_best"),
        F.count(F.lit(1)).alias("n_paths"),
    )
    chosen = (
        paths.join(best, "conv_id")
        .where(F.col("total_score") == F.col("_best"))
        .groupBy("conv_id")
        .agg(F.min("leaf_id").alias("leaf_id"))
    )
    return (
        paths.join(chosen, ["conv_id", "leaf_id"])
        .join(best, "conv_id")
        .select(
            "conv_id", "leaf_id", "depth", "path",
            "total_score", "n_paths",
        )
    )


def preference_pairs(
    df, conv_col: str = "conv_id", node_col: str = "node_id",
    parent_col: str = "parent_id", role_col: str = "role",
    score_col: str = "score",
):
    """(chosen, rejected) preference-pair extraction from regenerated
    assistant siblings — the RLHF/DPO data staple: when one prompt
    turn has several assistant children (regenerations), the
    best-scored sibling is ``chosen`` and every other sibling is a
    ``rejected`` partner.  Deterministic under any partitioning:
    chosen = max score, ties broken by MIN node id.  Branch points
    with a single candidate emit nothing.

    The ranking is TWO scalar hash aggs, not one ``max(struct)``:
    struct-buffered aggregates (``max(struct)``, ``max_by``,
    ``first``) fall to SortAggregate in Spark 4 (the same trap the
    IVF argmax hit, README "Performance notes"), so we take
    ``max(score)`` (pass 1), join the scores back, and take
    ``min(node) FILTER (score = max)`` (pass 2) — every agg a
    long-buffered, map-side-combining HashAggregate, no window,
    and no packed-bigint range assumption on user scores.

    Output: ``(conv_id, parent_id, chosen_id, rejected_id,
    chosen_score, rejected_score, margin)`` — one row per rejected
    sibling.

    Scale shape: everything shuffles on the ONE (conv, parent) key —
    two hash aggs + two equi join-backs, all co-partitioned; group
    sizes are bounded by the per-turn regeneration count."""
    cands = df.where(
        (F.col(role_col) == "assistant") & F.col(parent_col).isNotNull()
    ).select(
        F.col(conv_col).cast("long").alias("conv_id"),
        F.col(parent_col).cast("long").alias("parent_id"),
        F.col(node_col).cast("long").alias("node_id"),
        F.col(score_col).cast("long").alias("_score"),
    )
    key = ["conv_id", "parent_id"]
    best = (
        cands.groupBy(*key)
        .agg(
            F.max("_score").alias("chosen_score"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") >= 2)
        .drop("_n")
    )
    base = cands.join(best, key)
    chosen = base.groupBy(*key).agg(
        F.min(
            F.when(F.col("_score") == F.col("chosen_score"), F.col("node_id"))
        ).alias("chosen_id")
    )
    return (
        base.join(chosen, key)
        .where(F.col("node_id") != F.col("chosen_id"))
        .select(
            "conv_id",
            "parent_id",
            "chosen_id",
            F.col("node_id").alias("rejected_id"),
            "chosen_score",
            F.col("_score").alias("rejected_score"),
            (F.col("chosen_score") - F.col("_score")).alias("margin"),
        )
    )


def context_fit(
    df, budget: int, conv_col: str = "conv_id",
    turn_col: str = "turn_idx", role_col: str = "role",
    tokens_col: str = "n_tokens",
):
    """Context-window fitting for chat training samples: keep every
    ``system`` turn (standing instructions) plus the LONGEST SUFFIX of
    the remaining turns whose token total fits the budget left after
    the system turns — the standard truncate-from-the-front policy
    that preserves turn boundaries (never splits a turn; a turn that
    doesn't fit is dropped whole, unlike ``pack_sequences`` which
    packs documents across boundaries).

    Returns every input row tagged ``kept`` (boolean) plus
    ``sys_tokens`` and ``suffix_tokens`` (the running suffix total
    that decided the row, NULL on system rows) so downstream filters
    and audits both read from one pass.

    Scale shape: ONE hash exchange on the conversation key shared by
    both window passes (a partition-wide system-token sum and a
    reverse running sum over the non-system turns); partition sizes
    are bounded by conversation length, never corpus size.  Pure
    Catalyst — no Python, no explode."""
    from pyspark.sql import Window

    conv = F.col(conv_col)
    is_sys = F.col(role_col) == "system"
    wp = Window.partitionBy(conv_col)
    wr = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col).cast("long")
    sys_tokens = F.sum(F.when(is_sys, toks).otherwise(0)).over(wp)
    # reverse running total over NON-system turns only (system rows
    # contribute 0 and take no suffix slot)
    suffix = F.sum(F.when(is_sys, F.lit(0)).otherwise(toks)).over(wr)
    left = F.greatest(F.lit(budget) - sys_tokens, F.lit(0))
    return df.select(
        conv_col,
        turn_col,
        role_col,
        toks.alias(tokens_col),
        sys_tokens.alias("sys_tokens"),
        F.when(is_sys, F.lit(None).cast("long"))
        .otherwise(suffix)
        .alias("suffix_tokens"),
        (is_sys | (suffix <= left)).alias("kept"),
    )


def cross_doc_novelty(
    docs, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, min_docs: int = 2,
):
    """Cross-document novelty / inter-document duplication scoring
    (the Gopher-style "repetition ACROSS documents" filter, distinct
    from :func:`repetition_signals`' within-document measures): per
    document, the fraction of its distinct n-gram shingles that also
    occur in at least ``min_docs − 1`` OTHER documents.  A high
    shared ratio marks boilerplate/templated text that exact and
    near-dup dedup both miss (the doc as a whole is unique, its
    phrasing is not) — a memorization-risk and quality signal.

    Scale shape: one explode of per-doc DISTINCT shingles → one
    map-side-combining hash agg keyed on the shingle (each shingle's
    doc-frequency; repeats collapse per task before the shuffle,
    exactly the CDC fold's skew story) → one join back on the shingle
    key → one per-doc hash agg.  No window, no Python, no all-pairs;
    at 100 TB the shingle keys ride as md5 prefixes if the raw
    strings are too wide for the exchange.

    Output: ``(id_col, n_shingles, n_shared, shared_ratio6)`` —
    ratio floored to 1e-6 for stable cross-engine hashing; documents
    too short to shingle are absent.
    """
    sh = docs.select(
        id_col,
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
        ).alias("_sh"),
    )
    df_counts = sh.groupBy("_sh").agg(
        F.count(F.lit(1)).alias("_df")
    )
    return (
        sh.join(df_counts, "_sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_df") >= min_docs, 1).otherwise(0)
            ).alias("n_shared"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_shared",
            (
                F.floor(
                    F.col("n_shared") / F.col("n_shingles") * 1000000
                )
                / 1000000
            ).alias("shared_ratio6"),
        )
    )


def boilerplate_replies(
    turns, role: str = "assistant", min_convs: int = 2,
    conv_col: str = "conv_id", turn_col: str = "turn_idx",
    role_col: str = "role", text_col: str = "text",
):
    """Templated-reply detection over conversation transcripts: the
    canned/boilerplate assistant replies that recur VERBATIM across
    conversations (canned refusals, template greetings, error
    apologies) — a cleaning signal whole-conversation dedup misses
    (each conversation is unique; one of its turns is not) and the
    turn-level sibling of :func:`tool_flow`'s trajectory dedup.

    Clusters exact ``text_col`` bytes of ``role`` turns via md5 and
    reports every reply appearing in at least ``min_convs`` DISTINCT
    conversations, with a deterministic canonical exemplar (lowest
    conversation, then lowest turn within it — two scalar hash aggs
    joined on the md5 key, the SortAggregate-proof two-pass ranking;
    min(struct) would fall to SortAggregate).  Empty texts are
    excluded (they are :func:`transcript_qa`'s defect class, not
    boilerplate).

    Output: ``(reply_md5, n_convs, n_turns, canon_conv, canon_turn)``.
    Scale shape: hash aggs keyed on the md5 (map-side combine
    collapses the hot templated keys per task — the CDC fold's skew
    story) + one join back on the same key; no window, no Python.
    """
    base = (
        turns.where(
            (F.col(role_col) == role)
            & F.col(text_col).isNotNull()
            & (F.col(text_col) != "")
        )
        .select(
            F.md5(F.col(text_col)).alias("reply_md5"),
            F.col(conv_col).alias("_conv"),
            F.col(turn_col).alias("_turn"),
        )
    )
    stats = base.groupBy("reply_md5").agg(
        F.countDistinct("_conv").alias("n_convs"),
        F.count(F.lit(1)).alias("n_turns"),
        F.min("_conv").alias("canon_conv"),
    )
    canon = (
        base.join(
            stats.select("reply_md5", "canon_conv"),
            "reply_md5",
        )
        .where(F.col("_conv") == F.col("canon_conv"))
        .groupBy("reply_md5")
        .agg(F.min("_turn").alias("canon_turn"))
    )
    return (
        stats.where(F.col("n_convs") >= min_convs)
        .join(canon, "reply_md5")
        .select(
            "reply_md5", "n_convs", "n_turns",
            "canon_conv", "canon_turn",
        )
    )
