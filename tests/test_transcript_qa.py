"""transcript_qa: per-conversation integrity report over the payload
table (turn-index gaps/dups, role alternation, orphan tool turns,
empty turns).  Fixtures plant each defect class in isolation plus a
clean conversation; the plan test pins the one-shuffle/no-window
shape."""

from pg_pb3_ld_spark.functions.textops import transcript_qa

DDL = "conv_id string, turn_idx int, role string, text string"


def _report(spark, rows):
    df = transcript_qa(spark.createDataFrame(rows, DDL))
    return {r["conv_id"]: r.asDict() for r in df.collect()}


def test_clean_conversation_ok(spark):
    rows = [
        ("c", 0, "system", "s"),
        ("c", 1, "user", "hi"),
        ("c", 2, "assistant", "call"),
        ("c", 3, "tool", "result"),
        ("c", 4, "assistant", "done"),
    ]
    r = _report(spark, rows)["c"]
    assert r == {
        "conv_id": "c", "n_turns": 5, "has_gap": False,
        "has_dup_idx": False, "role_violations": 0, "orphan_tools": 0,
        "empty_turns": 0, "ok": True,
    }


def test_each_defect_class_detected(spark):
    rows = [
        # gap: 0,1,3
        ("gap", 0, "user", "a"), ("gap", 1, "assistant", "b"),
        ("gap", 3, "user", "c"),
        # duplicate turn_idx (distinct idxs still cover 0..1: no gap)
        ("dup", 0, "user", "a"), ("dup", 1, "assistant", "b"),
        ("dup", 1, "user", "c"),
        # starts at 1 instead of 0
        ("off", 1, "user", "a"), ("off", 2, "assistant", "b"),
        # two assistants in a row
        ("role", 0, "user", "a"), ("role", 1, "assistant", "b"),
        ("role", 2, "assistant", "c"),
        # tool after a user turn = orphan
        ("orph", 0, "user", "a"), ("orph", 1, "tool", "t"),
        # tool opening the conversation = orphan AND a bad opener
        ("topen", 0, "tool", "t"), ("topen", 1, "assistant", "a"),
        # empty + null text
        ("emp", 0, "user", ""), ("emp", 1, "assistant", None),
    ]
    rep = _report(spark, rows)
    assert rep["gap"]["has_gap"] and not rep["gap"]["has_dup_idx"]
    assert rep["dup"]["has_dup_idx"] and not rep["dup"]["has_gap"]
    assert rep["off"]["has_gap"]
    assert rep["role"]["role_violations"] == 1
    assert rep["orph"]["orphan_tools"] == 1
    assert rep["topen"]["orphan_tools"] == 1
    assert rep["topen"]["role_violations"] == 1  # bad opener only
    assert rep["emp"]["empty_turns"] == 2
    assert not any(v["ok"] for v in rep.values())


def test_single_turn_and_determinism(spark):
    rows = [("s", 0, "user", "hi")]
    r = _report(spark, rows)["s"]
    assert r["ok"] and r["n_turns"] == 1
    # duplicate-idx ties resolve by the canonical (idx, role, empty)
    # order regardless of input row order
    a = [("d", 0, "assistant", "x"), ("d", 0, "tool", "y")]
    assert _report(spark, a) == _report(spark, list(reversed(a)))


def test_plan_one_exchange_no_window(spark):
    df = transcript_qa(
        spark.createDataFrame([("c", 0, "user", "a")], DDL)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(conv_id") == 1
    assert "Window" not in plan
    assert "Python" not in plan and "mapInPandas" not in plan
