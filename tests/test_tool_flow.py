"""Behavioral (tool-trajectory) dedup of agent transcripts."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_pb3_ld_spark.functions.textops import tool_flow

TURNS = "conv_id string, turn_idx int, role string, tool string"


def _df(spark, rows):
    return spark.createDataFrame(rows, TURNS)


def test_identical_flows_cluster(spark):
    # a and b: same trajectory, different text would be irrelevant;
    # c differs only in WHICH tool is called
    rows = [
        ("a", 0, "user", None), ("a", 1, "assistant", None),
        ("a", 2, "tool", "search"), ("a", 3, "assistant", None),
        ("b", 0, "user", None), ("b", 1, "assistant", None),
        ("b", 2, "tool", "search"), ("b", 3, "assistant", None),
        ("c", 0, "user", None), ("c", 1, "assistant", None),
        ("c", 2, "tool", "calc"), ("c", 3, "assistant", None),
    ]
    got = {
        r["conv_id"]: (
            r["n_turns"], r["n_tool_turns"], r["flow_count"],
            r["is_canonical"], r["canonical_conv"],
        )
        for r in tool_flow(_df(spark, rows)).collect()
    }
    assert got == {
        "a": (4, 1, 2, True, "a"),
        "b": (4, 1, 2, False, "a"),
        "c": (4, 1, 1, True, "c"),
    }


def test_order_matters_and_partition_invariance(spark):
    # same multiset of actions, different ORDER → different flows
    rows = [
        ("x", 0, "user", None), ("x", 1, "tool", "a"), ("x", 2, "tool", "b"),
        ("y", 0, "user", None), ("y", 1, "tool", "b"), ("y", 2, "tool", "a"),
    ]
    out = tool_flow(_df(spark, rows))
    sigs = {r["conv_id"]: r["flow_sig"] for r in out.collect()}
    assert sigs["x"] != sigs["y"]
    # shuffled input partitioning yields identical fingerprints
    out2 = tool_flow(_df(spark, rows).repartition(7, "turn_idx"))
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in out2.collect()
    }


def test_fingerprint_is_portable_md5(spark):
    import hashlib

    rows = [("z", 0, "user", None), ("z", 1, "tool", "t1")]
    sig = tool_flow(_df(spark, rows)).collect()[0]["flow_sig"]
    assert sig == hashlib.md5(b"user:|tool:t1").hexdigest()


def test_plan_no_window_no_python(spark):
    rows = [("a", 0, "user", None)]
    plan = (
        tool_flow(_df(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
