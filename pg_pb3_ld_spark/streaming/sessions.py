"""Custom stateful streaming operator: conversation session tracking.

The apply path (runner.py) is deliberately stateless-per-batch (state
lives in the store's snapshot). This module is the *custom stateful
operator* story — ``applyInPandasWithState`` keeping per-conversation
state ACROSS micro-batches, the Spark-native analog of what the
reference's consumer would build per replication session:

* state per ``conv_id``: change count, distinct turns seen, last LSN;
* every micro-batch that touches a conversation emits its cumulative
  row (``done = false``) — running progress for monitoring/routing;
* with ``timeout_ms > 0``, a conversation idle for that long (no
  changes in any micro-batch) is flushed once as ``done = true`` and
  its state dropped — the "conversation completed" signal a
  downstream trainer would key on.

Scale notes: state is hash-partitioned by conv_id (same key as the
target table's buckets), sized O(active conversations); the decoded
change stream feeds it directly (``decode_typed_changes`` works on
streaming DataFrames — mapInArrow is streaming-safe).  This operator
is an analytics/monitoring view: it does NOT replace the exactly-once
apply path, so it reads the ungated change stream (a commit-gate over
streaming state would need the txn-id join variant).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = (
    "conv_id string, n_changes long, n_turns int, max_turn int, "
    "last_lsn long, done boolean"
)
STATE_DDL = "n_changes long, turns array<int>, last_lsn long"


def track_conversations(
    changes: DataFrame, timeout_ms: int = 0
) -> DataFrame:
    """Streaming (conv_id, turn_idx, op, lsn) rows → stateful
    per-conversation progress stream (see module doc)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n_changes, turns, last_lsn = state.get
            state.remove()
            yield pd.DataFrame(
                [{
                    "conv_id": key[0],
                    "n_changes": int(n_changes),
                    "n_turns": len(turns),
                    "max_turn": max(turns) if turns else -1,
                    "last_lsn": int(last_lsn),
                    "done": True,
                }]
            )
            return
        if state.exists:
            n_changes, turns, last_lsn = state.get
            turns = set(turns)
        else:
            n_changes, turns, last_lsn = 0, set(), -1
        for pdf in pdfs:
            n_changes += len(pdf)
            turns.update(int(t) for t in pdf["turn_idx"] if t is not None)
            if len(pdf):
                last_lsn = max(last_lsn, int(pdf["lsn"].max()))
        state.update((int(n_changes), sorted(turns), int(last_lsn)))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{
                "conv_id": key[0],
                "n_changes": int(n_changes),
                "n_turns": len(turns),
                "max_turn": max(turns) if turns else -1,
                "last_lsn": int(last_lsn),
                "done": False,
            }]
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return changes.groupBy("conv_id").applyInPandasWithState(
        fn, OUTPUT_DDL, STATE_DDL, "update", timeout
    )
