"""Watermarked window / session-window aggregations over event streams.

Beyond-reference surface (the reference has no streaming operators —
SURVEY §2.4); built entirely from Structured Streaming primitives so state
stores, late-data handling, and incremental output come from Spark.
Works identically on batch DataFrames (the watermark is a no-op), which is
how the DuckDB oracle checks the windowing logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding) per-key event rollup with a watermark:
    (window_start, window_end, key, n_events, n_users, total_value)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        src.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "n_users",
            "total_value",
        )
    )


def running_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 day",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value), re-emitted every micro-batch the user
    appears in.  State is two scalars per user but grows with distinct-user
    cardinality — running totals are inherently per-user, and the watermark
    alone drops late *rows*, it does not evict state. For unbounded user
    populations pass ``idle_timeout`` (e.g. ``"7 days"``): users idle past
    the watermark by that long are evicted (their totals restart from zero
    if they reappear). In batch mode the same totals come from a plain
    groupBy (the oracle shape)."""
    if not events.isStreaming:
        return events.groupBy(user_col).agg(
            F.count("*").alias("n_events"), F.sum(value_col).alias("total_value")
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    idle_ms = int(pd.Timedelta(idle_timeout).total_seconds() * 1000) if idle_timeout else 0

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if idle_ms:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idle_ms)
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"{user_col} long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if idle_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session windows (gap-based): (user_id, session_start,
    session_end, n_events, total_value).  ``F.session_window`` keeps the
    state store bounded by the watermark; batch mode computes the same
    sessions for oracle comparison."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(sw.alias("s"), F.col(user_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            user_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
