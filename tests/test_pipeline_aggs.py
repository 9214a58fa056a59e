"""Pipeline aggregations (igd_spark/aggs.py pipeline family): hand-computed
window semantics over a fixed bucket series — derivative/serial_diff lag
NULLs, moving_fn's exclude-current default window, cumulative running sum,
bucket_selector NULL-drop, bucket_sort truncation determinism — plus one
composition check over a real date_histogram parent."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    bucket_selector_agg,
    bucket_sort_agg,
    cumulative_sum_agg,
    date_histogram_agg,
    derivative_agg,
    moving_fn_agg,
    serial_diff_agg,
)
from igd_spark.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def buckets(spark):
    # two queries; query 1's series has a gap (bucket 3 missing) to pin the
    # gap_policy=skip semantic (lag = previous EXISTING bucket)
    rows = [
        (0, 1, 10), (0, 2, 7), (0, 3, 7), (0, 4, 1),
        (1, 1, 5), (1, 2, 2), (1, 4, 8),
    ]
    return spark.createDataFrame(
        rows, "query_id long, bucket int, n_docs long"
    ).cache()


def _by_key(rows, col):
    return {(r["query_id"], r["bucket"]): r[col] for r in rows}


def test_derivative(spark, buckets):
    d = _by_key(derivative_agg(buckets).collect(), "derivative")
    assert d[(0, 1)] is None  # first bucket: no derivative (ES contract)
    assert d[(0, 2)] == -3.0
    assert d[(0, 3)] == 0.0
    assert d[(0, 4)] == -6.0
    # gap: bucket 4's neighbor is bucket 2 (gap_policy=skip)
    assert d[(1, 4)] == 6.0


def test_cumulative_sum(spark, buckets):
    c = _by_key(cumulative_sum_agg(buckets).collect(), "cumulative")
    assert c[(0, 1)] == 10.0
    assert c[(0, 4)] == 25.0
    assert c[(1, 4)] == 15.0


def test_moving_fn_excludes_current_by_default(spark, buckets):
    m = _by_key(moving_fn_agg(buckets, window=2).collect(), "moving_avg")
    assert m[(0, 1)] is None  # empty leading window
    assert m[(0, 2)] == 10.0
    assert m[(0, 3)] == pytest.approx(8.5)
    assert m[(0, 4)] == 7.0
    # shift=1 slides the window to include the current bucket
    m1 = _by_key(
        moving_fn_agg(buckets, window=2, shift=1).collect(), "moving_avg"
    )
    assert m1[(0, 1)] == 10.0
    assert m1[(0, 2)] == pytest.approx(8.5)


def test_moving_fn_other_fns_and_validation(spark, buckets):
    mx = _by_key(moving_fn_agg(buckets, window=3, fn="max").collect(), "moving_max")
    assert mx[(0, 4)] == 10.0
    with pytest.raises(ValueError):
        moving_fn_agg(buckets, fn="median")
    with pytest.raises(ValueError):
        moving_fn_agg(buckets, window=0)


def test_serial_diff(spark, buckets):
    s = _by_key(serial_diff_agg(buckets, lag=2).collect(), "serial_diff")
    assert s[(0, 1)] is None and s[(0, 2)] is None
    assert s[(0, 3)] == -3.0
    assert s[(0, 4)] == -6.0
    with pytest.raises(ValueError):
        serial_diff_agg(buckets, lag=0)


def test_bucket_selector_drops_null_and_false(spark, buckets):
    # predicate over a derivative: first buckets (NULL derivative) drop
    out = bucket_selector_agg(derivative_agg(buckets), "derivative <= 0").collect()
    keys = {(r["query_id"], r["bucket"]) for r in out}
    assert keys == {(0, 2), (0, 3), (0, 4), (1, 2)}


def test_bucket_sort_truncation(spark, buckets):
    out = bucket_sort_agg(
        buckets, [("n_docs", "desc")], size=2
    ).collect()
    got = {(r["query_id"], r["bucket"]): r["pos"] for r in out}
    assert got == {(0, 1): 1, (0, 2): 2, (1, 4): 1, (1, 1): 2}
    # from/size paging: second page of size 2 for query 0
    page2 = bucket_sort_agg(buckets, [("n_docs", "desc")], size=2, frm=2)
    keys = {(r["query_id"], r["bucket"]) for r in page2.collect()}
    assert keys == {(0, 3), (0, 4), (1, 2)}
    with pytest.raises(ValueError):
        bucket_sort_agg(buckets, [("n_docs", "down")])


def test_pipeline_over_date_histogram_parent(spark, tiny_docs):
    # composition: cumulative_sum over a real date_histogram series equals
    # the total match count at the last bucket
    docs = assign_doc_ids(tiny_docs).withColumn(
        "ts2",
        F.expr(
            "timestampadd(DAY, CAST(doc_id % 5 AS INT), "
            "TIMESTAMP'2026-01-01 00:00:00')"
        ),
    )
    q = spark.createDataFrame([(0, "error")], "query_id long, query_text string")
    dh = date_histogram_agg(docs, q, "ts2", interval="day")
    out = cumulative_sum_agg(dh).orderBy("bucket").collect()
    assert len(out) >= 2
    assert out[-1]["cumulative"] == sum(r["n_docs"] for r in out)
    assert isinstance(out[0]["bucket"], datetime.datetime)


def test_auto_date_histogram_interval_pick(spark, tiny_docs):
    from igd_spark import auto_date_histogram_agg, date_histogram_agg
    from igd_spark.corpus import assign_doc_ids

    # spread the matched docs over ~40 days
    docs = assign_doc_ids(tiny_docs).withColumn(
        "ts2",
        F.expr(
            "timestampadd(HOUR, CAST(doc_id % 1000 AS INT), "
            "TIMESTAMP'2026-01-01 00:00:00')"
        ),
    )
    q = spark.createDataFrame([(0, "error")], "query_id long, query_text string")
    # target 10 → finest fitting over a ~41-day span is week (≈6 buckets)
    out = auto_date_histogram_agg(docs, q, "ts2", target_buckets=10).collect()
    assert {r["interval"] for r in out} == {"week"}
    # buckets equal the fixed-interval histogram at the picked interval
    wk = date_histogram_agg(docs, q, "ts2", interval="week").collect()
    assert {(r["bucket"], r["n_docs"]) for r in out} == {
        (r["bucket"], r["n_docs"]) for r in wk
    }
    # larger budget → finer interval; tiny budget → coarser
    fine = auto_date_histogram_agg(docs, q, "ts2", target_buckets=50).collect()
    assert {r["interval"] for r in fine} == {"day"}
    coarse = auto_date_histogram_agg(docs, q, "ts2", target_buckets=2).collect()
    assert {r["interval"] for r in coarse} == {"month"}
    with pytest.raises(ValueError):
        auto_date_histogram_agg(docs, q, "ts2", target_buckets=0)


def test_change_point_step(spark):
    from igd_spark import change_point_agg

    # query 0: clean step 5,5,5,5 -> 20,20,20,20 at bucket 5; query 1 too
    # short (3 < 2*min_side); query 2: decreasing step with interior noise
    rows = (
        [(0, b, 5) for b in range(1, 5)] + [(0, b, 20) for b in range(5, 9)]
        + [(1, 1, 3), (1, 2, 9), (1, 3, 3)]
        + [(2, b, 50) for b in range(1, 4)] + [(2, 3, 51), (2, 4, 2), (2, 5, 3)]
    )
    # (2,3) appears twice above — drop the stray dup, keep 51
    rows = [r for r in rows if r != (2, 3, 50)]
    buckets = spark.createDataFrame(rows, "query_id long, bucket int, n_docs long")
    out = {r["query_id"]: r for r in change_point_agg(buckets).collect()}
    assert set(out) == {0, 2}  # query 1 emits no row (too few buckets)
    assert out[0]["change_bucket"] == 5
    assert out[0]["direction"] == "increase"
    assert out[0]["score"] > 100  # zero-variance sides: eps-bounded, huge
    assert out[2]["change_bucket"] == 4
    assert out[2]["direction"] == "decrease"


def test_change_point_stationary_and_ties(spark):
    from igd_spark import change_point_agg

    # constant series: every split scores 0 -> earliest eligible split wins
    # (k = min_side, change bucket = min_side + 1), direction stationary
    rows = [(0, b, 7) for b in range(1, 7)]
    buckets = spark.createDataFrame(rows, "query_id long, bucket int, n_docs long")
    out = change_point_agg(buckets).collect()
    assert len(out) == 1
    r = out[0]
    assert r["direction"] == "stationary"
    assert r["score"] == 0.0
    assert r["change_bucket"] == 3
    with pytest.raises(ValueError):
        change_point_agg(buckets, min_side=0)
