"""Event-analytics semantics (Markov transitions, ordered windowed funnel,
retention cohorts) against hand-checkable fixtures. Cross-engine value checks
live in scripts/gate_check.py."""

from __future__ import annotations

from datetime import datetime

import pytest

from igd_spark.events import event_transitions, funnel_counts, retention_cohorts

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h, m), u, t) for i, (u, d, h, m, t) in enumerate(rows)],
        SCHEMA,
    )


def test_transitions_counts_and_probs(spark):
    # user 1: a -> b -> a ; user 2: a -> b  =>  a->b x2, b->a x1
    ev = _ev(spark, [
        (1, 1, 0, 0, "a"), (1, 1, 1, 0, "b"), (1, 1, 2, 0, "a"),
        (2, 1, 0, 0, "a"), (2, 1, 3, 0, "b"),
    ])
    got = {(r.prev_type, r.event_type): (r.n_transitions, r.p_transition)
           for r in event_transitions(ev).collect()}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transitions_never_cross_users(spark):
    # last event of user 1 is "x", first of user 2 is "y": no x->y row
    ev = _ev(spark, [(1, 1, 0, 0, "x"), (2, 1, 1, 0, "y"), (2, 1, 2, 0, "y")])
    got = {(r.prev_type, r.event_type) for r in event_transitions(ev).collect()}
    assert got == {("y", "y")}


def test_funnel_order_matters(spark):
    # user 1 completes a->b in order; user 2 has b BEFORE a (not a conversion);
    # user 3 only a
    ev = _ev(spark, [
        (1, 1, 0, 0, "a"), (1, 1, 1, 0, "b"),
        (2, 1, 1, 0, "b"), (2, 1, 2, 0, "a"),
        (3, 1, 0, 0, "a"),
    ])
    rows = {r.step_idx: r for r in funnel_counts(ev, ["a", "b"]).collect()}
    assert rows[1].n_users == 3 and rows[1].conversion == 1.0
    assert rows[2].n_users == 1 and rows[2].conversion == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_window_cuts_late_conversions(spark):
    # both users convert a->b, but user 2 takes 3 hours; 60-minute window
    # admits only user 1
    ev = _ev(spark, [
        (1, 1, 0, 0, "a"), (1, 1, 0, 30, "b"),
        (2, 1, 0, 0, "a"), (2, 1, 3, 0, "b"),
    ])
    rows = {r.step_idx: r for r in funnel_counts(ev, ["a", "b"], window_minutes=60).collect()}
    assert rows[2].n_users == 1
    rows = {r.step_idx: r for r in funnel_counts(ev, ["a", "b"]).collect()}
    assert rows[2].n_users == 2  # unwindowed: both


def test_funnel_window_is_per_hop(spark):
    # a->b->c with each hop 50 min apart: total 100 min but every hop fits
    # a 60-min window
    ev = _ev(spark, [
        (1, 1, 0, 0, "a"), (1, 1, 0, 50, "b"), (1, 1, 1, 40, "c"),
    ])
    rows = {r.step_idx: r for r in
            funnel_counts(ev, ["a", "b", "c"], window_minutes=60).collect()}
    assert rows[3].n_users == 1


def test_funnel_strictly_after(spark):
    # user's only b is the SAME event row ordering edge: b at identical ts
    # but smaller event_id than a is NOT after it
    ev = spark.createDataFrame(
        [(0, datetime(2024, 1, 1, 0, 0), 1, "b"), (1, datetime(2024, 1, 1, 0, 0), 1, "a")],
        SCHEMA,
    )
    rows = {r.step_idx: r for r in funnel_counts(ev, ["a", "b"]).collect()}
    assert rows[1].n_users == 1 and rows[2].n_users == 0


def test_funnel_empty_steps_raise(spark):
    ev = _ev(spark, [(1, 1, 0, 0, "a")])
    with pytest.raises(ValueError):
        funnel_counts(ev, [])


def test_retention_triangle(spark):
    # user 1 active days 1,2,4 (cohort 1); user 2 active days 2,2 (cohort 2,
    # dup same-day events collapse)
    ev = _ev(spark, [
        (1, 1, 0, 0, "a"), (1, 2, 5, 0, "a"), (1, 4, 9, 0, "a"),
        (2, 2, 1, 0, "a"), (2, 2, 23, 59, "a"),
    ])
    got = {(r.cohort_day, r.day_offset): r.n_users for r in retention_cohorts(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
    }
