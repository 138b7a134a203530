"""Event / time-series operators (EXTENSION X6; SURVEY.md §2.7).

Batch-first implementations over the ``events`` fixture (event_id, ts,
user_id, event_type, value, props). The Structured Streaming variants live in
``streaming/events_stream.py`` and reuse the same windowing semantics.

Scale notes (100 TB of events):

- Tumbling/sliding windows are pure ``groupBy`` on a derived key — partial
  aggregation shrinks each map task to (n_windows x n_types) rows before the
  shuffle. No per-event state.
- Sessionization shuffles once on ``user_id`` (window functions need the
  partition co-located) and sorts within partitions; memory is bounded by
  events-per-user, not table size. For pathological users, bound sessions
  with a secondary date bucket in the partition key.
- Running aggregates are the same single-shuffle pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import money, money_sum


def _epoch() -> Column:
    """floor(epoch seconds) of ts — matches the oracle's
    CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT). Built lazily: column
    expressions need an active session, so no module-level construction."""
    return F.unix_timestamp("ts")


def _window_agg(events: DataFrame, window: Column, extra: list[str]) -> DataFrame:
    """Shared window-agg body: counts/sums per (window_start, *extra), the
    window start emitted as epoch seconds so oracle comparison is
    timezone-proof. A tumbling window is a sliding window with
    slide == duration, so both public forms share this one body."""
    return (
        events.groupBy(window.alias("w"), *extra)
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            *extra,
            "n_events",
            "sum_value",
        )
    )


def tumbling_window_agg(
    events: DataFrame,
    *,
    duration: str = "1 hour",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums — ``F.window`` is origin-aligned, the
    same grid as DuckDB's date_trunc for whole-hour durations."""
    return _window_agg(events, F.window("ts", duration), group_extra or [])


def sliding_window_agg(
    events: DataFrame,
    *,
    duration_sec: int = 3600,
    slide_sec: int = 1800,
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Sliding-window aggregation: each event expands into duration/slide
    windows before the hash agg — expansion x partial-agg, no per-key state."""
    return _window_agg(
        events,
        F.window("ts", f"{duration_sec} seconds", f"{slide_sec} seconds"),
        group_extra or [],
    )


def sessionize(
    events: DataFrame,
    *,
    gap_sec: int = 1800,
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the pause since
    the user's previous event exceeds ``gap_sec``.

    Classic lag + cumulative-sum-of-boundaries; both windows share the same
    (partition, order) so Spark plans ONE shuffle + one sort. Session ids are
    deterministic: (user_id, session_seq).
    """
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy(user_col).orderBy(*order)
    epoch = _epoch()
    with_gap = events.withColumn(
        "_new_session",
        F.when(
            (epoch - F.lag(epoch).over(w)).isNull()
            | ((epoch - F.lag(epoch).over(w)) > gap_sec),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_id = with_gap.withColumn(
        "session_seq", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(epoch) - F.min(epoch)).alias("duration_sec"),
            money_sum("value").alias("session_value"),
        )
    )


def running_agg(events: DataFrame, *, user_col: str = "user_id") -> DataFrame:
    """Per-user running total of ``value`` in event order."""
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        user_col,
        # Decimal running sum: exact under any frame-evaluation strategy
        # (functions/money.py; DuckDB's segment tree re-associates doubles).
        F.sum(money("value")).over(w).cast("double").alias("running_value"),
    )
