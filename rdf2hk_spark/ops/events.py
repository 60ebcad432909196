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

    The gap compares MICROSECOND-exact integer differences
    (timestampdiff), not floor-seconds — an event 1800.4 s after its
    predecessor opens a new 30-min-gap session on every engine, with no
    sub-second boundary ambiguity and no session-timezone/DST dependence
    (wall-clock arithmetic on the naive timestamps). Events with a null
    timestamp are DROPPED (documented; the streaming twin does the same).

    Shape: ONE shuffle by user_id feeds both window functions (lag → new-
    session flag, running sum → session index) and the final groupBy reuses
    the same partitioning — Catalyst plans a single Exchange."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    base = (
        events.filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id")
        .withColumn("_prev", F.lag("ts").over(w))
    )
    diff_us = F.expr("timestampdiff(MICROSECOND, _prev, ts)")
    with_sess = base.withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull() | (diff_us > gap_us), F.lit(1)
        ).otherwise(F.lit(0)),
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
