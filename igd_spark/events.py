"""Event-stream analytics — gap-based sessionization over the events table.

The training-data-pipeline sibling of the reference's sorted-scan machinery:
IGD's query loop walks records sorted by start coordinate and reacts to gaps
between consecutive intervals (the running-max early exit,
src/igd_search.c:790-812); sessionization walks events sorted by time within
a user and cuts a session whenever the gap to the previous event exceeds a
threshold — the same "sorted scan + neighbor predicate" shape, expressed as
window functions (lag + running sum of session starts).

Scale notes: both windows partition by user_id — a fine-grained key (one
shuffle, no skew beyond the busiest single user); no driver-side state.
Timestamps are compared as epoch MICROSECONDS (unix_micros / epoch_us), the
only representation DuckDB and Spark render identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_id, start_us, end_us, n_events, sum_value) — one row
    per (user, session), where a session breaks when the gap from the
    previous event of the same user exceeds gap_minutes. session_id is the
    user-local 1-based session ordinal; ties in ts are ordered by event_id
    so session boundaries are deterministic. sum_value is rounded to 6 dp
    (session cardinality is small enough that cross-engine float-sum-order
    noise stays below the rounding grain)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        # cast handles TIMESTAMP_NTZ sources: the session timezone is pinned
        # to UTC, so the NTZ→TZ reinterpretation matches DuckDB's naive
        # epoch_us exactly
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(value_col).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(prev.isNull() | (F.col("ts_us") - prev > gap_us), 1).otherwise(0)
    sid = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    tagged = ev.withColumn("session_id", sid.cast("int"))
    return tagged.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
