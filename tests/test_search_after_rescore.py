"""search_after (keyset pagination) and rescore (two-pass ranking)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from igd_spark import lm_dirichlet_topk, rescore_topk, search_after_topk
from igd_spark.corpus import assign_doc_ids
from igd_spark.search import bm25_scores, rank_topk

K = 5


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


@pytest.fixture(scope="module")
def queries(spark, docs):
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    ts = term_stats(postings(docs)).filter((F.col("df") >= 15) & (F.col("df") <= 80))
    terms = [r["term"] for r in ts.orderBy("term").limit(2).collect()]
    return spark.createDataFrame(
        [(0, terms[0]), (1, f"{terms[0]} {terms[1]}")],
        "query_id long, query_text string",
    )


def _ranked(docs, queries, n):
    scored = bm25_scores(docs, queries).withColumn("score", F.round("score", 6))
    return rank_topk(scored, n)


def test_pages_disjoint_and_contiguous(spark, docs, queries):
    full = {(r["query_id"], r["rank"]): r["doc_id"] for r in _ranked(docs, queries, 2 * K).collect()}
    page1 = _ranked(docs, queries, K)
    cursor = page1.filter(F.col("rank") == K).select(
        "query_id",
        F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )
    page2 = search_after_topk(docs, queries, cursor, k=K, round_dp=6).collect()
    for r in page2:
        # page-2 rank i == global rank K+i: keyset filter splits the total
        # order exactly at the cursor
        assert full[(r["query_id"], K + r["rank"])] == r["doc_id"]
    p1 = {(r["query_id"], r["doc_id"]) for r in page1.collect()}
    p2 = {(r["query_id"], r["doc_id"]) for r in page2}
    assert not (p1 & p2)


def test_no_cursor_means_page_one(spark, docs, queries):
    empty = spark.createDataFrame(
        [], "query_id long, after_score double, after_doc_id long"
    )
    out = search_after_topk(docs, queries, empty, k=K, round_dp=6)
    exp = _ranked(docs, queries, K)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, exp.collect()))


def test_rescore_stays_inside_window_and_combines(spark, docs, queries):
    window_size, qw, rw = 8, 1.0, 2.0
    out = rescore_topk(
        docs, queries, window_size=window_size, query_weight=qw,
        rescore_weight=rw, mu=2000.0, k=K, round_dp=6,
    ).collect()
    win = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in _ranked(docs, queries, window_size).collect()
    }
    lmd = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in lm_dirichlet_topk(
            docs, queries, mu=2000.0, k=10**6, round_dp=6
        ).collect()
    }
    assert out
    for r in out:
        key = (r["query_id"], r["doc_id"])
        assert key in win, "rescore must never resurface docs outside the window"
        expected = round(qw * win[key] + rw * lmd.get(key, 0.0), 6)
        assert r["score"] == pytest.approx(expected, abs=1e-6)
