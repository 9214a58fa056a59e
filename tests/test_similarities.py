"""Alternative similarities (ClassicSimilarity TF-IDF, LM Jelinek-Mercer):
brute-force score verification against hand-computed formulas and
indexed-twin rank identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    lm_jelinek_mercer_topk,
    lm_jelinek_mercer_topk_indexed,
    tfidf_topk,
    tfidf_topk_indexed,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.stats import corpus_stats, doc_stats, term_stats
from igd_spark.tokenizer import postings


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


@pytest.fixture(scope="module")
def sim_idx(spark, docs, tmp_path_factory):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path_factory.mktemp("simidx") / "idx")
    return build_index(spark, docs, path, conf=conf)


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _stats(docs):
    post = {(r["term"], r["doc_id"]): r["tf"] for r in postings(docs).collect()}
    ds = {r["doc_id"]: r["dl"] for r in doc_stats(docs).collect()}
    cs = corpus_stats(doc_stats(docs)).collect()[0]
    ts = {r["term"]: r["df"] for r in term_stats(postings(docs)).collect()}
    return post, ds, cs, ts


def test_tfidf_bruteforce(spark, docs):
    post, ds, cs, ts = _stats(docs)
    out = tfidf_topk(docs, _queries(spark, [(0, "error timeout")]), k=5).collect()
    assert out and out[0]["rank"] == 1
    for r in out:
        expect = 0.0
        for t in ("error", "timeout"):
            tf = post.get((t, r["doc_id"]))
            if tf:
                idf = 1.0 + math.log(cs["n_docs"] / (ts[t] + 1.0))
                expect += math.sqrt(tf) * idf * idf / math.sqrt(ds[r["doc_id"]])
        assert r["score"] == pytest.approx(expect, rel=1e-9)


def test_lmjm_bruteforce_and_lambda_validation(spark, docs):
    post, ds, cs, ts = _stats(docs)
    total = sum(ds.values())
    cf = {t: sum(tf for (tt, _), tf in post.items() if tt == t) for t in ("error", "timeout")}
    lam = 0.3
    out = lm_jelinek_mercer_topk(
        docs, _queries(spark, [(0, "error timeout")]), lam=lam, k=5
    ).collect()
    assert out
    for r in out:
        expect = 0.0
        for t in ("error", "timeout"):
            tf = post.get((t, r["doc_id"]))
            if tf:
                x = ((1 - lam) * tf / ds[r["doc_id"]]) / (lam * cf[t] / total)
                expect += math.log(1.0 + x)
        assert r["score"] == pytest.approx(expect, rel=1e-9)
    with pytest.raises(ValueError):
        lm_jelinek_mercer_topk(docs, _queries(spark, [(0, "x")]), lam=0.0)


def test_similarities_indexed_identity(spark, docs, sim_idx):
    q = _queries(spark, [(0, "error timeout"), (1, "deploy")])
    a = tfidf_topk(docs, q, k=8, round_dp=6, conf=sim_idx.conf).collect()
    b = tfidf_topk_indexed(spark, sim_idx, q, k=8, round_dp=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    a = lm_jelinek_mercer_topk(
        docs, q, lam=0.2, k=8, round_dp=6, conf=sim_idx.conf
    ).collect()
    b = lm_jelinek_mercer_topk_indexed(
        spark, sim_idx, q, lam=0.2, k=8, round_dp=6
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_similarity_driver_route_rank_identity(spark, docs, sim_idx):
    import time

    q = spark.createDataFrame(
        [(0, "error timeout"), (1, "deploy")], "query_id long, query_text string"
    )
    for model, fn in (
        ("tfidf", tfidf_topk_indexed),
        ("lm_jm", lm_jelinek_mercer_topk_indexed),
    ):
        a = fn(spark, sim_idx, q, k=8, round_dp=6, engine="spark").collect()
        b = fn(spark, sim_idx, q, k=8, round_dp=6, engine="driver").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), model
    # warm driver path is ms-scale (no Spark job): measure the kernel alone
    from igd_spark.local import local_searcher

    ls = local_searcher(sim_idx)
    rows = [(0, "error timeout"), (1, "deploy")]
    ls.sim_topk_n(rows, model="tfidf", k=8, round_dp=6)  # warm the lists
    t0 = time.perf_counter()
    ls.sim_topk_n(rows, model="tfidf", k=8, round_dp=6)
    assert (time.perf_counter() - t0) < 0.25
    with pytest.raises(ValueError):
        ls.sim_topk_n(rows, model="bm11")
    with pytest.raises(ValueError):
        ls.sim_topk_n(rows, model="lm_jm", lam=1.5)
