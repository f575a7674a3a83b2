"""Sessionization: gap-based event sessions per user.

The classic clickstream operator: order each user's events by time, start a
new session when the gap from the previous event exceeds a threshold,
number sessions with a running sum over the new-session flags, then
aggregate per session.  Pure window-function composition (lag -> flag ->
cumulative sum -> groupBy): deterministic, engine-portable, and shuffle-
efficient — one hash partition by user, all windows run within it.

At scale this is the batch twin of a Structured Streaming session window
(``session_window`` / ``applyInPandasWithState``); the batch form is used
for the oracle-checked surface because its semantics are exactly
reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign ``session_seq`` (1-based per user) to each event."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    # Exact integer microseconds (epoch_us == DuckDB epoch_us, NTZ-safe);
    # second-granularity unix_timestamp would truncate and misclassify
    # events that straddle the gap by <1s.
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(epoch_us(ts_col)).over(w)
    new_session = F.when(
        prev_us.isNull() | ((epoch_us(ts_col) - prev_us) > gap_us),
        1,
    ).otherwise(0)
    return events.withColumn("is_new_session", new_session).withColumn(
        "session_seq",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates: length, duration, value totals
    (``value_col`` names the summed metric — parameterized like every
    other column here, not hard-wired to 'value')."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return (
        s.groupBy(F.col(user_col), F.col("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                (
                    epoch_us(F.max(ts_col)) - epoch_us(F.min(ts_col))
                ).cast("double")
                / 1_000_000.0,
                6,
            ).alias("duration_s"),
            F.round(F.sum(value_col), 2).alias("session_value"),
        )
    )
