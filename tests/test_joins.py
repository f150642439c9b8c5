"""As-of join (`functions/joins.py`) — edge semantics the driver
oracle's random data may not pin: strict-vs-inclusive at equal
timestamps, tiebreak among concurrent right rows, unmatched lefts,
payload collision guard, and one-exchange plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.joins import asof_join

L_DDL = "lid int, k string, ts long"
R_DDL = "rid int, k string, ts long, v string"


def _join(spark, lrows, rrows, **kw):
    left = spark.createDataFrame(lrows, L_DDL)
    right = spark.createDataFrame(rrows, R_DDL)
    out = asof_join(
        left, right, on=["k"], ts_col="ts", tiebreak="rid", **kw
    )
    return {
        r["lid"]: (r["rid"], r["v"], r["ts_right"])
        for r in out.collect()
    }


def test_strict_excludes_equal_ts(spark):
    got = _join(
        spark,
        [(1, "a", 10), (2, "a", 11)],
        [(100, "a", 10, "x")],
    )
    # strict: the ts=10 click cannot see the ts=10 purchase
    assert got == {1: (None, None, None), 2: (100, "x", 10)}


def test_inclusive_admits_equal_ts(spark):
    got = _join(
        spark,
        [(1, "a", 10)],
        [(100, "a", 10, "x")],
        inclusive=True,
    )
    assert got == {1: (100, "x", 10)}


def test_latest_right_wins_and_tiebreak(spark):
    got = _join(
        spark,
        [(1, "a", 50)],
        # two right rows at the SAME ts: greatest rid wins; a later
        # right row after the left is invisible
        [(100, "a", 20, "lo"), (101, "a", 20, "hi"), (102, "a", 60, "no")],
    )
    assert got == {1: (101, "hi", 20)}


def test_keys_do_not_leak_across_groups(spark):
    got = _join(
        spark,
        [(1, "a", 10), (2, "b", 10)],
        [(100, "a", 5, "x")],
    )
    assert got == {1: (100, "x", 5), 2: (None, None, None)}


def test_payload_collision_raises(spark):
    left = spark.createDataFrame([(1, "a", 10)], "lid int, k string, ts long")
    right = spark.createDataFrame(
        [(2, "a", 5, "x")], "lid int, k string, ts long, v string"
    )
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, on=["k"], ts_col="ts")


def test_single_exchange_plan(spark):
    left = spark.createDataFrame([(1, "a", 10)], L_DDL)
    right = spark.createDataFrame([(2, "a", 5, "x")], R_DDL)
    plan = (
        asof_join(left, right, on=["k"], ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole operator hangs off ONE hash exchange on the join key
    # (plus local-only exchanges for the tiny createDataFrame inputs)
    assert plan.count("hashpartitioning(k") == 1
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan

# ---------------------------------------------------------- interval


def _ij(spark, points, intervals, w=10):
    from pg_pb3_ld_spark.functions.joins import interval_join

    p = spark.createDataFrame(points, "pid int, ts long")
    i = spark.createDataFrame(intervals, "iid int, s long, e long")
    out = interval_join(p, i, "ts", "s", "e", bucket_width=w)
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_interval_inclusive_bounds_and_no_dups(spark):
    # interval spans 4 buckets (w=10): a point inside must match ONCE
    got = _ij(
        spark,
        [(1, 5), (2, 17), (3, 35), (4, 36), (5, 0)],
        [(7, 5, 35)],
    )
    # ts=5 (start, inclusive), 17 (middle), 35 (end, inclusive) match;
    # 36 and 0 don't; no (pid, iid) appears twice
    assert got == [(1, 7), (2, 7), (3, 7)]


def test_interval_overlapping_intervals(spark):
    got = _ij(
        spark,
        [(1, 12)],
        [(7, 0, 20), (8, 10, 30), (9, 13, 40)],
    )
    assert got == [(1, 7), (1, 8)]


def test_interval_unaligned_narrow_bucket(spark):
    # bucket narrower than interval AND interval inside one bucket
    assert _ij(spark, [(1, 7)], [(5, 6, 8)], w=100) == [(1, 5)]
    assert _ij(spark, [(1, 7)], [(5, 6, 8)], w=1) == [(1, 5)]


# ------------------------------------------- randomized differential


def test_asof_join_randomized_vs_bruteforce(spark):
    """Seeded random streams vs an O(n·m) Python reference — catches
    ordering/visibility bugs the handpicked cases miss."""
    import random

    rng = random.Random(99)
    for trial in range(4):
        lrows = [
            (i, f"k{rng.randint(0, 4)}", rng.randint(0, 40))
            for i in range(60)
        ]
        rrows = [
            (100 + i, f"k{rng.randint(0, 4)}", rng.randint(0, 40),
             f"v{i}")
            for i in range(60)
        ]
        want = {}
        for lid, lk, lts in lrows:
            best = None
            for rid, rk, rts, v in rrows:
                if rk == lk and rts < lts:
                    if best is None or (rts, rid) > (best[2], best[0]):
                        best = (rid, v, rts)
            want[lid] = best or (None, None, None)
        got = _join(spark, lrows, rrows)
        assert got == want, f"trial {trial}"


def test_interval_join_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    for trial, w in [(0, 5), (1, 17), (2, 100)]:
        points = [(i, rng.randint(0, 200)) for i in range(80)]
        ivals = []
        for i in range(15):
            s = rng.randint(0, 180)
            ivals.append((i, s, s + rng.randint(0, 60)))
        want = sorted(
            (pid, iid)
            for pid, ts in points
            for iid, s, e in ivals
            if s <= ts <= e
        )
        assert _ij(spark, points, ivals, w=w) == want, f"trial {trial}"


def test_overlap_chunks_cover_every_token_with_overlap(spark):
    from pg_pb3_ld_spark.functions import textops

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11))),  # 11 toks
         (2, "a b"),                                  # < size
         (3, " ".join(f"u{i}" for i in range(10)))],  # exact multiple
        "doc_id long, text string",
    )
    out = textops.overlap_chunks(docs, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,3,6,9 → last chunk short (2 toks), all covered
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in c1] == [0, 3, 6, 9]
    assert [r["n_tok"] for r in c1] == [4, 4, 4, 2]
    covered = set()
    for r in c1:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(11))
    # overlap: consecutive chunks share size - stride = 1 token
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    # short doc: single whole-doc chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b"
    # n=10,size=4,stride=3 → starts 0,3,6 cover 0..9 exactly
    assert [r["start_tok"] for r in sorted(
        by_doc[3], key=lambda r: r["chunk_idx"])] == [0, 3, 6]


def test_overlap_chunks_plan_has_no_shuffle_or_python(spark):
    from pg_pb3_ld_spark.functions import textops

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        textops.overlap_chunks(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan
    assert "Window" not in plan
