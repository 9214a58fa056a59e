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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(prev_type, event_type, n_transitions, p_transition) — first-order
    Markov transition counts over consecutive events of the same user
    (ordered by ts, then event_id for determinism under ts ties).
    p_transition = n / Σ n over the same prev_type, rounded to 6 dp — each
    prev_type row group sums to 1. The flow profile of an event stream
    (what follows what), same sorted-scan + lag shape as sessionize.

    Scale: one window exchange on user_id, one fine-keyed hash agg on the
    (prev, next) pair (at most |types|² groups), one tiny window over the
    aggregated pairs. No joins, no driver state."""
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(type_col).alias("event_type"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n_transitions")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(tot), 6).alias(
            "p_transition"
        ),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    window_minutes: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, event_type, n_users, conversion) — ordered funnel: a user
    completes step k when an event of type steps[k] occurs STRICTLY after
    their earliest completion of step k-1 ((ts, event_id) lexicographic, so
    ties are deterministic) — and, when window_minutes is set, no later than
    window_minutes after it (the per-hop conversion window every funnel tool
    offers; without it a long-lived stream converts everyone). n_users
    counts users reaching each step; conversion = n_users / step-1 users,
    rounded to 6 dp (step 1 row = 1.0).

    Scale: one filtered min-aggregation per step (len(steps) passes, each a
    map-side-combinable groupBy on user_id) joined user-to-user — no windows
    over the full stream, no event-to-event joins; the per-step frames
    shrink monotonically (funnels only narrow)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    window_us = None if window_minutes is None else int(window_minutes) * 60 * 1_000_000
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(type_col).alias("event_type"),
    )
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    reached: list[tuple[int, str, DataFrame]] = []
    prev: DataFrame | None = None
    for k, st in enumerate(steps):
        cand = ev.filter(F.col("event_type") == st)
        if prev is not None:
            after_prev = (F.col("ts_us") > F.col("k_ts")) | (
                (F.col("ts_us") == F.col("k_ts")) & (F.col("event_id") > F.col("k_id"))
            )
            if window_us is not None:
                after_prev = after_prev & (F.col("ts_us") <= F.col("k_ts") + window_us)
            cand = cand.join(prev, "user_id").filter(after_prev)
        cur = cand.groupBy("user_id").agg(F.min(key).alias("k"))
        cur = cur.select(
            "user_id", F.col("k.ts_us").alias("k_ts"), F.col("k.event_id").alias("k_id")
        )
        reached.append((k + 1, st, cur))
        prev = cur
    rows = None
    for k, st, cur in reached:
        r = cur.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(k).cast("int").alias("step_idx"),
            F.lit(st).alias("event_type"),
            "n_users",
        )
        rows = r if rows is None else rows.unionByName(r)
    # denominator via a 1-row broadcast (a constant-partition window would
    # fold to "no partitioning" and WindowExec warns on every run)
    base = rows.filter(F.col("step_idx") == 1).select(F.col("n_users").alias("base"))
    return rows.crossJoin(F.broadcast(base)).select(
        "step_idx",
        "event_type",
        "n_users",
        F.when(F.col("base") > 0, F.round(F.col("n_users") / F.col("base"), 6))
        .otherwise(F.lit(0.0))
        .alias("conversion"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — daily retention triangle: cohort =
    the user's first active calendar day (UTC), and for every later day the
    user is active, one (cohort, offset) credit; n_users = DISTINCT users
    active exactly day_offset days after their cohort day. cohort_day is a
    'yyyy-MM-dd' string (the one date rendering Spark and DuckDB share).
    offset 0 row = cohort size.

    Scale: distinct (user, day) activity (one agg), per-user min day (one
    agg over that), a user-keyed join, and the final fine-keyed count —
    no window over raw events, cardinality bounded by users × active days.

    Day bucketing is epoch-microsecond arithmetic (floor(unix_micros /
    86.4e9)), NOT date_trunc — date_trunc buckets by
    spark.sql.session.timeZone, which silently shifts cohort days across
    midnight-UTC in a non-UTC session (sessionize avoids the same drift
    the same way). The only residual session-tz dependence is string→
    timestamp PARSING when ts_col is a string; timestamp-typed inputs
    (the events table) are instants and bucket identically everywhere."""
    day_ord = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("int")
    act = events.select(F.col(user_col).alias("user_id"), day_ord.alias("dord")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("dord").alias("cord"))
    epoch = F.lit("1970-01-01").cast("date")
    joined = act.join(cohort, "user_id").select(
        "user_id",
        F.date_format(F.date_add(epoch, F.col("cord")), "yyyy-MM-dd").alias("cohort_day"),
        (F.col("dord") - F.col("cord")).cast("int").alias("day_offset"),
    )
    return joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
