"""Rank-identity gate (BASELINE.json north_rule): engine top-k (both the
exact DataFrame scorer and the index-backed MaxScore scorer) must match the
pure-python oracle's docIDs exactly and scores to float tolerance, on the
reference query set (FIXTURES.md §2 shape)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import oracle
from igd_spark.config import IndexConf
from igd_spark.corpus import assign_doc_ids
from igd_spark.index import build_index
from igd_spark.search import exact_bm25_topk, match_enumerate, search

K = 10


def make_queries(spark):
    # FIXTURES.md §2: probes, hot head terms, mid, rare, OOV, multi-term
    qs = [
        (0, "error"),
        (1, "timeout deploy"),
        (2, "t00000"),               # hottest head term
        (3, "t00000 t00001 t00002"),
        (4, "t00123 t04567"),
        (5, "t09999"),               # rare tail term
        (6, "zzz-not-in-vocab"),     # OOV → 0 hits, must not crash
        (7, "error t00000 t09998 qqqq"),
        (8, "T00005, ERROR!"),       # tokenizer normalization inside query
        (9, "t00007 t00007 t00007"), # duplicate terms count once
    ]
    return (
        spark.createDataFrame(pd.DataFrame(qs, columns=["query_id", "query_text"])),
        qs,
    )


@pytest.fixture(scope="module")
def corpus(spark, tiny_docs):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    docs = assign_doc_ids(tiny_docs, conf).cache()
    pdf = docs.select("doc_id", "text").toPandas()
    oidx = oracle.build_oracle_index(
        list(zip(pdf["doc_id"].astype(int), pdf["text"]))
    )
    return conf, docs, oidx


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    conf, docs, _ = corpus
    path = str(tmp_path_factory.mktemp("idx") / "tiny_index")
    idx = build_index(spark, docs, path, conf=conf)
    return idx


def _collect_topk(df):
    rows = df.orderBy("query_id", "rank").collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


def _assert_rank_identical(got: dict, qs, oidx, min_tf=0):
    for qid, qtext in qs:
        exp = oracle.bm25_topk(oidx, qtext, k=K, min_tf=min_tf)
        g = got.get(qid, [])
        assert [d for d, _ in g] == [d for d, _ in exp], (qid, qtext, g, exp)
        assert np.allclose(
            [s for _, s in g], [s for _, s in exp], rtol=1e-9, atol=1e-12
        ), (qid, qtext)


def test_exact_scorer_rank_identical(spark, corpus):
    conf, docs, oidx = corpus
    queries, qs = make_queries(spark)
    got = _collect_topk(exact_bm25_topk(docs, queries, k=K, conf=conf))
    _assert_rank_identical(got, qs, oidx)


def test_indexed_scorer_rank_identical(spark, corpus, built):
    conf, docs, oidx = corpus
    queries, qs = make_queries(spark)
    got = _collect_topk(search(spark, built, queries, k=K))
    _assert_rank_identical(got, qs, oidx)


def test_indexed_scorer_min_tf(spark, corpus, built):
    """Value-threshold filter (src/igd_search.c:623-694 analog)."""
    conf, docs, oidx = corpus
    queries, qs = make_queries(spark)
    got = _collect_topk(search(spark, built, queries, k=K, min_tf=2))
    _assert_rank_identical(got, qs, oidx, min_tf=2)


def test_match_enumeration(spark, corpus, built):
    """Full-match mode (igd search -f analog)."""
    conf, docs, oidx = corpus
    queries, _ = make_queries(spark)
    one = queries.filter(F.col("query_id") == 1)  # "timeout deploy"
    got = (
        match_enumerate(spark, built, one)
        .orderBy("term", "doc_id")
        .collect()
    )
    exp = oracle.match_enumerate(oidx, "timeout deploy")
    assert [(r["term"], r["doc_id"], r["tf"]) for r in got] == exp
