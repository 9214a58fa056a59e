"""Round-5 continuation aggs + queries (value_count/global/date_range,
sibling & moving-percentile & rate & cumulative-cardinality pipeline aggs,
exists/ids filters, span_or): brute-force semantics checks on the synthetic
transcript corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    cumulative_cardinality_agg,
    date_histogram_agg,
    date_range_agg,
    exact_bm25_topk,
    exists_bm25_topk,
    global_agg,
    ids_bm25_topk,
    moving_percentiles_agg,
    percentiles_bucket_agg,
    rate_agg,
    span_or_match,
    stats_bucket_agg,
    value_count_agg,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.stats import term_stats
from igd_spark.tokenizer import postings


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


@pytest.fixture(scope="module")
def docs_ts(docs):
    # deterministic synthetic timestamp + nullable field + user id
    return (
        docs.withColumn(
            "ts2",
            F.expr(
                "timestampadd(HOUR, CAST(abs(doc_id) % 200 AS INT), "
                "TIMESTAMP'2026-01-01 00:00:00')"
            ),
        )
        .withColumn(
            "nfield",
            F.expr(
                "CASE WHEN abs(doc_id) % 5 = 0 THEN NULL "
                "ELSE concat('v', CAST(abs(doc_id) % 4 AS STRING)) END"
            ),
        )
        .withColumn("usr", F.expr("concat('u', CAST(abs(doc_id) % 13 AS STRING))"))
        .cache()
    )


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _mid_term(docs):
    ts = term_stats(postings(docs)).filter((F.col("df") >= 10) & (F.col("df") <= 60))
    return ts.orderBy("term").limit(1).collect()[0]["term"]


def _match_ids(docs, term):
    return {
        r["doc_id"]
        for r in postings(docs).filter(F.col("term") == term).select("doc_id").collect()
    }


def test_value_count_plus_missing_partitions_match_set(spark, docs_ts):
    term = _mid_term(docs_ts)
    ids = _match_ids(docs_ts, term)
    rows = docs_ts.select("doc_id", "nfield").collect()
    n_nonnull = sum(1 for r in rows if r["doc_id"] in ids and r["nfield"] is not None)
    out = value_count_agg(docs_ts, _queries(spark, [(0, term)]), "nfield").collect()
    assert len(out) == 1 and out[0]["value_count"] == n_nonnull


def test_global_agg_counts(spark, docs_ts):
    term = _mid_term(docs_ts)
    ids = _match_ids(docs_ts, term)
    out = global_agg(docs_ts, _queries(spark, [(0, term)])).collect()
    assert len(out) == 1
    assert out[0]["n_matched"] == len(ids)
    assert out[0]["n_global"] == docs_ts.count()


def test_date_range_emits_all_buckets_with_zero_counts(spark, docs_ts):
    term = _mid_term(docs_ts)
    ranges = [
        (None, "2026-01-03 00:00:00"),
        ("2026-01-03 00:00:00", "2026-01-15 00:00:00"),
        ("2030-01-01 00:00:00", None),  # beyond the synthetic span: 0 docs
    ]
    out = date_range_agg(
        docs_ts, _queries(spark, [(0, term)]), "ts2", ranges
    ).collect()
    assert len(out) == 3
    by_from = {str(r["range_from"]): r["n_docs"] for r in out}
    assert by_from["2030-01-01 00:00:00"] == 0
    assert sum(r["n_docs"] for r in out) >= 1
    # totals over the two covering buckets == match-set size (ts < 2026-01-10)
    ids = _match_ids(docs_ts, term)
    covered = sum(
        r["n_docs"] for r in out if str(r["range_from"]) != "2030-01-01 00:00:00"
    )
    assert covered == len(ids)


def test_stats_and_percentiles_bucket_over_parent_series(spark, docs_ts):
    term = _mid_term(docs_ts)
    dh = date_histogram_agg(docs_ts, _queries(spark, [(0, term)]), "ts2", "day")
    series = sorted(r["n_docs"] for r in dh.collect())
    sb = stats_bucket_agg(dh).collect()[0]
    assert sb["n_buckets"] == len(series)
    assert sb["min_v"] == min(series) and sb["max_v"] == max(series)
    assert sb["sum_v"] == pytest.approx(sum(series))
    pb = {r["pct"]: r["value"] for r in percentiles_bucket_agg(dh).collect()}
    # exact linear interpolation at the median
    n = len(series)
    rank = (n - 1) * 0.5
    lo, hi = int(rank), min(int(rank) + 1, n - 1)
    expect = series[lo] + (rank - lo) * (series[hi] - series[lo])
    assert pb[50.0] == pytest.approx(expect)


def test_moving_percentiles_window_semantics(spark, docs_ts):
    term = _mid_term(docs_ts)
    dh = date_histogram_agg(docs_ts, _queries(spark, [(0, term)]), "ts2", "day")
    out = moving_percentiles_agg(dh, window=2, percent=50.0).orderBy("bucket").collect()
    vals = [r["n_docs"] for r in out]
    # first bucket: empty trailing window -> NULL
    assert out[0]["moving_pct"] is None
    if len(out) >= 3:
        # third bucket: median of buckets 0 and 1
        expect = sorted(vals[0:2])
        mid = (expect[0] + expect[1]) / 2.0
        assert out[2]["moving_pct"] == pytest.approx(mid)


def test_rate_agg_rescales(spark, docs_ts):
    term = _mid_term(docs_ts)
    dh = date_histogram_agg(docs_ts, _queries(spark, [(0, term)]), "ts2", "day")
    out = rate_agg(dh, interval="day", unit="hour").collect()
    for r in out:
        assert r["rate"] == pytest.approx(r["n_docs"] / 24.0)
    with pytest.raises(ValueError):
        rate_agg(dh, interval="month", unit="hour")


def test_cumulative_cardinality_first_appearance_identity(spark, docs_ts):
    term = _mid_term(docs_ts)
    ids = _match_ids(docs_ts, term)
    rows = docs_ts.select("doc_id", "ts2", "usr").collect()
    import collections

    by_bucket = collections.defaultdict(set)
    for r in rows:
        if r["doc_id"] in ids:
            by_bucket[r["ts2"].date().isoformat()[:10]].add(r["usr"])
    out = (
        cumulative_cardinality_agg(
            docs_ts, _queries(spark, [(0, term)]), "ts2", "usr", "day"
        )
        .orderBy("bucket")
        .collect()
    )
    seen: set[str] = set()
    for r in out:
        seen |= by_bucket[str(r["bucket"])[:10]]
        assert r["cumulative_cardinality"] == len(seen)


def test_exists_filters_but_keeps_global_stats(spark, docs_ts):
    term = _mid_term(docs_ts)
    q = _queries(spark, [(0, term)])
    out = exists_bm25_topk(docs_ts, q, "nfield", k=5).collect()
    nonnull_ids = {
        r["doc_id"]
        for r in docs_ts.filter(F.col("nfield").isNotNull())
        .select("doc_id")
        .collect()
    }
    assert out and all(r["doc_id"] in nonnull_ids for r in out)
    # scores equal the unfiltered scorer's for surviving docs (global stats)
    full = {
        r["doc_id"]: r["score"]
        for r in exact_bm25_topk(docs_ts, q, k=10_000).collect()
    }
    for r in out:
        assert r["score"] == pytest.approx(full[r["doc_id"]])


def test_ids_restricts_to_shortlist(spark, docs_ts):
    term = _mid_term(docs_ts)
    ids = sorted(_match_ids(docs_ts, term))[:4]
    out = ids_bm25_topk(docs_ts, _queries(spark, [(0, term)]), ids, k=10).collect()
    assert {r["doc_id"] for r in out} == set(ids)
    with pytest.raises(ValueError):
        ids_bm25_topk(docs_ts, _queries(spark, [(0, term)]), [], k=10)


def test_span_or_counts_any_alternative(spark):
    docs = spark.createDataFrame(
        [
            (1, "error then timeout now"),       # error->timeout within 2
            (2, "error xx yy zz refused"),       # distance 4 > span
            (3, "error reset error timeout ok"), # two pairs within 3
            (4, "timeout error"),                # wrong order
        ],
        "doc_id long, text string",
    )
    q = _queries(spark, [(0, "error whatever")])
    out = {
        (r["doc_id"]): r["n_hits"]
        for r in span_or_match(docs, q, "timeout refused reset", span=3).collect()
    }
    # doc 1: (error@0, timeout@2). doc 3: (error@0,reset@1),(error@2,timeout@3),
    # (error@0, timeout@3? dist 3 <= 3 yes) -> pairs: e0-r1, e0-t3, e2-t3 = 3
    assert out[1] == 1
    assert out[3] == 3
    assert 2 not in out and 4 not in out


def test_span_multi_expands_prefix_in_vocab(spark):
    docs = spark.createDataFrame(
        [
            (1, "error then timing out"),     # error -> tim* (timing) at d2
            (2, "error xx yy zz timberwolf"), # distance 4 > span 3
            (3, "error timid error timer"),   # multiple expansions
            (4, "timing error"),              # wrong order
        ],
        "doc_id long, text string",
    )
    from igd_spark import span_multi_match

    q = _queries(spark, [(0, "error anything")])
    out = {
        r["doc_id"]: r["n_hits"]
        for r in span_multi_match(docs, q, "tim", span=3).collect()
    }
    # doc3 pairs: (e@0,timid@1),(e@0,timer@3),(e@2,timer@3) = 3
    assert out[1] == 1 and out[3] == 3
    assert 2 not in out and 4 not in out


def test_significant_terms_chi_square_heuristic(spark):
    from igd_spark import significant_terms

    # 6 docs; query term 'q' matches docs 1-3; 'hot' appears in exactly the
    # match set (perfect association), 'everywhere' in all docs (no signal)
    docs = spark.createDataFrame(
        [
            (1, "q hot everywhere"),
            (2, "q hot everywhere"),
            (3, "q hot everywhere"),
            (4, "cold everywhere"),
            (5, "cold everywhere"),
            (6, "cold everywhere"),
        ],
        "doc_id long, text string",
    )
    q = _queries(spark, [(0, "q")])
    out = significant_terms(docs, q, k=10, heuristic="chi_square").collect()
    by_term = {r["term"]: r for r in out}
    # 'everywhere' has fg_pct == bg_pct -> not over-represented -> absent
    assert "everywhere" not in by_term
    # perfect 2x2 association: chi2 = N = 6 for 'hot' (and 'q' itself)
    assert by_term["hot"]["score"] == pytest.approx(6.0)
    # jlh still the default and still ranks hot/q on top
    jlh = significant_terms(docs, q, k=2).collect()
    assert {r["term"] for r in jlh} <= {"hot", "q"}
    with pytest.raises(ValueError):
        significant_terms(docs, q, heuristic="nope")


def test_extended_stats_bucket_and_correlation(spark, docs_ts):
    import statistics

    from igd_spark import bucket_correlation_agg, extended_stats_bucket_agg

    term = _mid_term(docs_ts)
    dh = date_histogram_agg(docs_ts, _queries(spark, [(0, term)]), "ts2", "day")
    ordered = [r["n_docs"] for r in dh.orderBy("bucket").collect()]
    es = extended_stats_bucket_agg(dh).collect()[0]
    assert es["n_buckets"] == len(ordered)
    assert es["variance"] == pytest.approx(statistics.pvariance(ordered), abs=1e-6)
    assert es["sum_sq"] == pytest.approx(sum(x * x for x in ordered))
    # perfect correlation: indicator == the series itself
    out = bucket_correlation_agg(dh, [float(x) for x in ordered]).collect()[0]
    assert out["corr"] == pytest.approx(1.0)
    # length mismatch -> NULL
    out2 = bucket_correlation_agg(dh, [1.0, 2.0]).collect()[0]
    assert out2["corr"] is None
    with pytest.raises(ValueError):
        bucket_correlation_agg(dh, [])
