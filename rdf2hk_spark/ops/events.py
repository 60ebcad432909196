"""Event-stream analytics over the ``events`` table (event_id, ts, user_id,
event_type, value, props): the batch expressions of the windowed/stateful
shapes the streaming layer runs (streaming/ingest.py page_rate_stats uses the
same ``F.window`` aggregation on a stream).

Scale notes:
- ``windowed_event_counts`` is one groupBy over (window, type) — map-side
  partial aggregation collapses each partition to one row per (window, type)
  before the shuffle; time-bucketing is a pure Column expression.
- ``sessionize`` shuffles once by user_id for the lag/cumsum window pair.
  Per-user data is bounded by a user's own event count; a pathological
  single user (bot firehose) is the classic window-skew case — at corpus
  scale cap or pre-split such users upstream (the gap rule makes time-range
  splitting exact: events more than ``gap`` apart never share a session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts per event_type:
    (window_start, event_type, n) — the batch twin of the streaming
    watermark+window aggregation."""
    return (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the user's previous event exceeds ``gap_minutes``. Returns one row per
    session: (user_id, session_idx, n_events, t_start, t_end) with
    session_idx 0-based in time order.

    Shape: ONE shuffle by user_id feeds both window functions (lag → new-
    session flag, running sum → session index) and the final groupBy reuses
    the same partitioning — Catalyst plans a single Exchange."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
            > gap_minutes * 60
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = events.select(
        "user_id", "ts", "event_id", is_new.alias("_new")
    ).withColumn(
        "session_idx",
        (F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("long"),
    )
    return with_sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )
