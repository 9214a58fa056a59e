"""Driver-side conjunctive boolean route (LocalSearcher.bool_n): must be
value-identical to the distributed bool_bm25_topk_indexed plan and to the
corpus-scan bool_bm25_topk on every clause shape — AND, NOT, corpus-absent
terms, analyzer-removed (stopword) terms, duplicate query rows — and demote
to the cluster on budget misses."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import IndexConf, build_index
from igd_spark.corpus import assign_doc_ids
from igd_spark.querylang import bool_bm25_topk, bool_bm25_topk_indexed

CONF = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)


def _sorted(df):
    p = df.toPandas() if not isinstance(df, pd.DataFrame) else df
    return p.sort_values(list(p.columns)).reset_index(drop=True)


def _pick_terms(docs, n):
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    ts = term_stats(postings(docs, conf=CONF)).filter(
        (F.col("df") >= 5) & (F.col("df") <= 40)
    )
    return [r["term"] for r in ts.orderBy("term").limit(n).collect()]


@pytest.fixture(scope="module")
def built(spark, tiny_docs, tmp_path_factory):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    path = str(tmp_path_factory.mktemp("boolidx") / "idx")
    return docs, build_index(spark, docs, path, conf=CONF)


def test_bool_driver_matches_spark_and_corpus(spark, built):
    docs, idx = built
    t1, t2, t3 = _pick_terms(docs, 3)
    q = spark.createDataFrame(
        [
            (0, f"{t1} {t2}", None),
            (1, t1, t2),                        # NOT clause live
            (2, f"{t1} zzznotavocab", None),    # absent term: matches nothing
            (3, t3, "zzznotavocab"),            # absent exclude: bans nothing
            (4, None, t1),                      # null text: no results
            (5, t2, None),
            (5, t3, None),                      # duplicate qid rows merge (AND)
        ],
        "query_id long, query_text string, exclude_text string",
    )
    for dp in (9, None):
        want = _sorted(bool_bm25_topk(
            docs, q, k=50, conf=CONF, exclude_col="exclude_text", round_dp=dp))
        a = _sorted(bool_bm25_topk_indexed(
            spark, idx, q, k=50, exclude_col="exclude_text", round_dp=dp,
            engine="driver"))
        b = _sorted(bool_bm25_topk_indexed(
            spark, idx, q, k=50, exclude_col="exclude_text", round_dp=dp,
            engine="spark"))
        pd.testing.assert_frame_equal(a, want)
        pd.testing.assert_frame_equal(b, want)
        assert len(want) > 0
        assert not (want["query_id"] == 2).any()
        assert not (want["query_id"] == 4).any()


def test_bool_driver_stopword_analyzer(spark, tiny_docs, tmp_path):
    """The stop-filter contract: an AND stopword clause is DROPPED (not an
    unsatisfiable requirement) identically on all three paths."""
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    base = assign_doc_ids(tiny_docs).cache()
    stop = (
        term_stats(postings(base)).orderBy(F.desc("df"), "term")
        .limit(1).collect()[0]["term"]
    )
    conf = IndexConf(block_size=32, n_shards=8, stopwords=(stop,), min_token_len=1)
    docs = assign_doc_ids(tiny_docs, conf).cache()
    idx = build_index(spark, docs, str(tmp_path / "sbidx"), conf=conf)
    t1 = (
        term_stats(postings(docs, conf=conf))
        .filter((F.col("df") >= 5) & (F.col("df") <= 40))
        .orderBy("term").limit(1).collect()[0]["term"]
    )
    q = spark.createDataFrame(
        [(0, f"{stop} {t1}", None), (1, stop, None)],
        "query_id long, query_text string, exclude_text string",
    )
    want = _sorted(bool_bm25_topk(
        docs, q, k=50, conf=conf, exclude_col="exclude_text", round_dp=9))
    got = _sorted(bool_bm25_topk_indexed(
        spark, idx, q, k=50, exclude_col="exclude_text", round_dp=9,
        engine="driver"))
    pd.testing.assert_frame_equal(got, want)
    # query 0 reduces to the single non-stop term; query 1 is all-stopword
    assert (want["query_id"] == 0).any()
    assert not (want["query_id"] == 1).any()


def test_bool_driver_native_input_and_budgets(spark, built, monkeypatch):
    docs, idx = built
    t1, t2 = _pick_terms(docs, 2)
    rows = [(0, f"{t1} {t2}", None), (1, t1, t2)]
    want = _sorted(bool_bm25_topk_indexed(
        spark, idx,
        spark.createDataFrame(rows, "query_id long, query_text string, exclude_text string"),
        k=20, exclude_col="exclude_text", round_dp=9, engine="spark"))
    got_list = _sorted(bool_bm25_topk_indexed(
        spark, idx, rows, k=20, exclude_col="exclude_text", round_dp=9,
        engine="driver"))
    got_pdf = _sorted(bool_bm25_topk_indexed(
        spark, idx,
        pd.DataFrame(rows, columns=["query_id", "query_text", "exclude_text"]),
        k=20, exclude_col="exclude_text", round_dp=9, engine="driver"))
    pd.testing.assert_frame_equal(got_list, want)
    pd.testing.assert_frame_equal(got_pdf, want)
    # budget demotion: auto falls back to the identical Spark plan; driver raises
    monkeypatch.setenv("IGD_SEARCH_DRIVER_MAX_POSTINGS", "1")
    auto = _sorted(bool_bm25_topk_indexed(
        spark, idx, rows, k=20, exclude_col="exclude_text", round_dp=9,
        engine="auto"))
    pd.testing.assert_frame_equal(auto, want)
    with pytest.raises(ValueError, match="driver_search_max_postings"):
        bool_bm25_topk_indexed(
            spark, idx, rows, k=20, exclude_col="exclude_text",
            engine="driver")


def test_round_half_up_spark_parity(spark):
    """_round_half_up_spark must equal F.round(double, dp) bit-for-bit,
    including values engineered onto the .5 boundary."""
    import numpy as np

    from igd_spark.local import _round_half_up_spark

    vals = [0.0, 1.2345675, 1.2345665, 2.5e-7, 7.4999995, 0.1234565,
            3.1415926535, 123.4567895, 1e-12, 19.99999949999]
    rows = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", F.round("x", 6).alias("r")).collect()
    got = _round_half_up_spark(np.array(vals, dtype=np.float64), 6)
    for (r, g) in zip(rows, got):
        assert float(r["r"]) == float(g), (r["x"], r["r"], g)
