"""Event-time windowed aggregation with watermarking.

The Structured-Streaming face of rate/volume monitoring over the
change stream: tumbling (or hopping, with ``slide``) event-time
windows aggregated per group key, with a watermark bounding how long
late data is admitted.  The reference's consumer sees changes in
strict WAL order, so lateness never arises there; a distributed
ingest fans the stream across partitions and must buy order back with
event-time semantics — this is the Spark-native answer (held window
state is finalized and emitted once the watermark passes the window
end; the lateness guarantee is one-directional — rows within the
threshold are never dropped, and rows arriving after their window
was evicted are dropped rather than re-emitted as duplicates).

``windowed_rates`` works unchanged on BATCH DataFrames (``F.window``
is an ordinary expression there and ``withWatermark`` is a no-op) —
the `event_window_agg` driver query oracle-checks the window algebra
against DuckDB bucket arithmetic, and ``tests/test_streaming_windows.
py`` pins the streaming-only semantics: per-micro-batch finalization
and late-row drop.

Scale shape: ONE hash exchange on (window, keys) — tumbling windows
assign each row to exactly one bucket, map-side partial aggregation
applies, and watermarking bounds state to O(open windows × keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_rates(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "6 hours",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling/hopping event-time window counts + value sum per key.

    Output: ``window`` struct (start, end) + key columns + n_events +
    sum_value (only if the input has a ``value`` column).  Pass
    ``watermark`` (e.g. ``"2 hours"``) on streaming input to bound
    state and enable append-mode finalization."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if "value" in df.columns:
        aggs.append(F.sum("value").alias("sum_value"))
    return df.groupBy(w.alias("window"), *[F.col(k) for k in keys]).agg(
        *aggs
    )
