"""Branched-conversation tree operators: pointer-doubling path
reconstruction (``textops.branch_paths``) and preference-pair
extraction from regenerated siblings (``textops.preference_pairs``).

The transcripts payload stores regenerations as sibling turns under
one parent, so conversations are trees; linearizing root→leaf paths
and mining (chosen, rejected) pairs are the downstream-consumer ops
the reference (decoded stream of pg_pb3_ld.c:300-334) leaves to its
users.
"""

import pytest
from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.textops import branch_paths, preference_pairs


def _tree(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, node_id long, parent_id long, role string, score long"
    )


def test_branch_paths_small_tree(spark):
    #        0(system)
    #        |
    #        1(user)
    #       / \
    #  2(asst) 3(asst)
    #      |
    #  4(user)
    rows = [
        (1, 0, None, "system", 0),
        (1, 1, 0, "user", 0),
        (1, 2, 1, "assistant", 3),
        (1, 3, 1, "assistant", 1),
        (1, 4, 2, "user", 0),
    ]
    out = {
        r["leaf_id"]: (r["depth"], r["path"])
        for r in branch_paths(_tree(spark, rows)).collect()
    }
    assert out == {3: (3, "0/1/3"), 4: (4, "0/1/2/4")}


def test_branch_paths_deep_chain_log_rounds(spark):
    # depth-40 chain settles inside 6 doubling rounds (2^6 = 64)
    rows = [(7, i, i - 1 if i else None, "user", 0) for i in range(40)]
    out = branch_paths(_tree(spark, rows), max_rounds=6).collect()
    assert len(out) == 1
    r = out[0]
    assert r["leaf_id"] == 39 and r["depth"] == 40
    assert r["path"] == "/".join(str(i) for i in range(40))


def test_branch_paths_cycle_raises(spark):
    rows = [(1, 0, 1, "user", 0), (1, 1, 0, "user", 0)]
    with pytest.raises(RuntimeError, match="cycle|settled"):
        branch_paths(_tree(spark, rows), max_rounds=4)


def test_branch_paths_dangling_parent_terminates(spark):
    # node 5 points at a parent that was never stored: the walk
    # terminates AT the dangler instead of nulling the path
    rows = [(2, 5, 99, "user", 0)]
    out = branch_paths(_tree(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["path"] == "5" and out[0]["depth"] == 1


def test_branch_paths_partition_invariance(spark):
    rows = [
        (c, i, i - 1 if i else None, "user", 0)
        for c in range(6)
        for i in range(c + 2)
    ]
    df = _tree(spark, rows)
    a = sorted(map(tuple, branch_paths(df).collect()))
    b = sorted(map(tuple, branch_paths(df.repartition(7)).collect()))
    assert a == b


def test_preference_pairs_tiebreak_and_singletons(spark):
    rows = [
        (1, 0, None, "system", 0),
        (1, 1, 0, "user", 0),
        # three siblings: 2 and 4 tie at score 5 -> chosen = min id 2
        (1, 2, 1, "assistant", 5),
        (1, 3, 1, "assistant", 2),
        (1, 4, 1, "assistant", 5),
        # singleton candidate group: no pairs
        (1, 5, 3, "user", 0),
        (1, 6, 5, "assistant", 9),
    ]
    out = preference_pairs(_tree(spark, rows))
    got = {
        (r["rejected_id"]): (r["chosen_id"], r["margin"])
        for r in out.collect()
    }
    assert got == {3: (2, 3), 4: (2, 0)}


def test_preference_pairs_ignores_non_assistant(spark):
    rows = [
        (3, 1, 0, "user", 9),
        (3, 2, 0, "user", 1),
        (3, 4, 0, "assistant", 1),
    ]
    # only ONE assistant candidate under parent 0 -> nothing
    assert preference_pairs(_tree(spark, rows)).count() == 0


# ------------------------------------------------------- context_fit

from pg_pb3_ld_spark.functions.textops import context_fit  # noqa: E402


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, n_tokens long"
    )


def test_context_fit_suffix_and_system(spark):
    rows = [
        (1, 0, "system", 10),
        (1, 1, "user", 50),
        (1, 2, "assistant", 40),
        (1, 3, "user", 30),
        (1, 4, "assistant", 20),
    ]
    # budget 100: system(10) leaves 90 -> suffix 20+30+40=90 fits,
    # +50 would overflow
    out = {r["turn_idx"]: r for r in
           context_fit(_turns(spark, rows), budget=100).collect()}
    assert [out[i]["kept"] for i in range(5)] == [
        True, False, True, True, True
    ]
    assert out[0]["suffix_tokens"] is None       # system row
    assert out[2]["suffix_tokens"] == 90
    assert all(r["sys_tokens"] == 10 for r in out.values())


def test_context_fit_system_exceeds_budget(spark):
    rows = [(2, 0, "system", 500), (2, 1, "user", 1)]
    out = {r["turn_idx"]: r for r in
           context_fit(_turns(spark, rows), budget=100).collect()}
    # system always kept; remaining budget floors at 0 -> no turns
    assert out[0]["kept"] is True
    assert out[1]["kept"] is False


def test_context_fit_turn_boundary_preserved(spark):
    # the newest turn alone exceeds the budget: dropped whole
    rows = [(3, 0, "system", 0), (3, 1, "user", 10), (3, 2, "user", 99)]
    out = {r["turn_idx"]: r for r in
           context_fit(_turns(spark, rows), budget=50).collect()}
    assert out[2]["kept"] is False
    # and the older small turn does NOT sneak in past a dropped
    # newer one (suffix is contiguous from the end by construction:
    # its running sum already includes the dropped turn)
    assert out[1]["kept"] is False


def test_context_fit_partition_invariance(spark):
    rows = [
        (c, i, "system" if i == 0 else "user", (c * 3 + i * 7) % 40)
        for c in range(8) for i in range(6)
    ]
    df = _turns(spark, rows)
    a = sorted(map(tuple, context_fit(df, budget=60).collect()))
    b = sorted(map(tuple,
                   context_fit(df.repartition(7), budget=60).collect()))
    assert a == b


# ------------------------------------------------- scored best paths

from pg_pb3_ld_spark.functions.textops import best_paths  # noqa: E402


def test_branch_paths_score_folding(spark):
    rows = [
        (1, 0, None, "system", 2),
        (1, 1, 0, "user", 3),
        (1, 2, 1, "assistant", 5),
        (1, 3, 1, "assistant", 1),
        (1, 4, 2, "user", 7),
    ]
    out = {r["leaf_id"]: r["total_score"] for r in branch_paths(
        _tree(spark, rows), score_col="score"
    ).collect()}
    assert out == {3: 2 + 3 + 1, 4: 2 + 3 + 5 + 7}


def test_branch_paths_score_deep_chain(spark):
    rows = [(7, i, i - 1 if i else None, "user", i) for i in range(40)]
    out = branch_paths(
        _tree(spark, rows), max_rounds=6, score_col="score"
    ).collect()
    assert out[0]["total_score"] == sum(range(40))


def test_best_paths_max_total_and_tiebreak(spark):
    rows = [
        (1, 0, None, "system", 0),
        (1, 1, 0, "user", 0),
        (1, 2, 1, "assistant", 5),   # leaf, total 5
        (1, 3, 1, "assistant", 2),   # extended below
        (1, 4, 3, "user", 3),        # leaf, total 5 -> TIE with leaf 2
        (2, 0, None, "system", 1),
        (2, 1, 0, "user", 9),        # single path
    ]
    out = {r["conv_id"]: r for r in
           best_paths(_tree(spark, rows)).collect()}
    # conv 1: totals tie at 5 -> min leaf_id 2 wins
    assert out[1]["leaf_id"] == 2 and out[1]["total_score"] == 5
    assert out[1]["n_paths"] == 2
    assert out[2]["leaf_id"] == 1 and out[2]["total_score"] == 10
    assert out[2]["n_paths"] == 1


def test_best_paths_partition_invariance(spark):
    rows = [
        (c, i, i - 1 if i else None, "user", (c * 5 + i * 3) % 7)
        for c in range(6) for i in range(c + 2)
    ]
    df = _tree(spark, rows)
    a = sorted(map(tuple, best_paths(df).collect()))
    b = sorted(map(tuple, best_paths(df.repartition(9)).collect()))
    assert a == b
