"""Driver-side dictionary-expansion route (prefix / wildcard indexed):
pyarrow starts_with / match_like probes + LocalSearcher.score_terms_n must
be value-identical to the distributed expansion plan and the corpus-scan
path, enforce the same max_expanded_terms contract, and demote on budget
misses."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import IndexConf, build_index
from igd_spark.corpus import assign_doc_ids
from igd_spark.querylang import (
    prefix_bm25_topk,
    prefix_bm25_topk_indexed,
    wildcard_bm25_topk,
    wildcard_bm25_topk_indexed,
)

CONF = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)


def _sorted(df):
    p = df.toPandas() if not isinstance(df, pd.DataFrame) else df
    return p.sort_values(list(p.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def built(spark, tiny_docs, tmp_path_factory):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    path = str(tmp_path_factory.mktemp("expidx") / "idx")
    return docs, build_index(spark, docs, path, conf=CONF)


def _some_prefix(docs):
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    t = (
        term_stats(postings(docs, conf=CONF))
        .filter(F.length("term") >= 4).orderBy(F.desc("df"), "term")
        .limit(1).collect()[0]["term"]
    )
    return t


def test_prefix_driver_matches_spark_and_corpus(spark, built):
    docs, idx = built
    t = _some_prefix(docs)
    q = spark.createDataFrame(
        [(0, f"{t[:3]} {t[:4]}"), (1, t[:2]), (2, "zzznope")],
        "query_id long, query_text string",
    )
    want = _sorted(prefix_bm25_topk(docs, q, k=30, conf=CONF, round_dp=9))
    a = _sorted(prefix_bm25_topk_indexed(spark, idx, q, k=30, round_dp=9,
                                         engine="driver"))
    b = _sorted(prefix_bm25_topk_indexed(spark, idx, q, k=30, round_dp=9,
                                         engine="spark"))
    pd.testing.assert_frame_equal(a, want)
    pd.testing.assert_frame_equal(b, want)
    assert len(want) > 0
    assert not (want["query_id"] == 2).any()


def test_wildcard_driver_matches_spark_and_corpus(spark, built):
    docs, idx = built
    t = _some_prefix(docs)
    pats = [
        (0, f"{t[:2]}?{t[3:]}"),          # single-char wildcard
        (1, f"{t[:3]}* {t[-2:]}*"),       # star + a second pattern
        (2, f"*{t[2:4]}*"),               # leading wildcard (full-vocab LIKE)
        (3, "zzz*nope"),                  # matches nothing
    ]
    q = spark.createDataFrame(pats, "query_id long, query_text string")
    want = _sorted(wildcard_bm25_topk(docs, q, k=30, conf=CONF, round_dp=9))
    a = _sorted(wildcard_bm25_topk_indexed(spark, idx, q, k=30, round_dp=9,
                                           engine="driver"))
    b = _sorted(wildcard_bm25_topk_indexed(spark, idx, q, k=30, round_dp=9,
                                           engine="spark"))
    pd.testing.assert_frame_equal(a, want)
    pd.testing.assert_frame_equal(b, want)
    assert len(want) > 0
    assert not (want["query_id"] == 3).any()


def test_expand_cap_raises_on_both_engines(spark, built):
    _, idx = built
    q = spark.createDataFrame([(0, "t")], "query_id long, query_text string")
    for eng in ("driver", "spark"):
        with pytest.raises(ValueError, match="max_expanded_terms"):
            prefix_bm25_topk_indexed(spark, idx, q, max_expanded_terms=1,
                                     engine=eng)


def test_expand_budget_demotion(spark, built, monkeypatch):
    docs, idx = built
    from igd_spark.local import local_searcher

    t = _some_prefix(docs)
    q = [(0, t[:3])]
    want = _sorted(prefix_bm25_topk_indexed(
        spark, idx,
        spark.createDataFrame(q, "query_id long, query_text string"),
        k=20, round_dp=9, engine="spark"))
    ls = local_searcher(idx)
    ls._expand_cache = {}  # force the vocab-footer admission tier
    monkeypatch.setenv("IGD_SEARCH_DRIVER_MAX_POSTINGS", "1")
    auto = _sorted(prefix_bm25_topk_indexed(spark, idx, q, k=20, round_dp=9,
                                            engine="auto"))
    pd.testing.assert_frame_equal(auto, want)
    with pytest.raises(ValueError, match="expansion probe budget"):
        prefix_bm25_topk_indexed(spark, idx, q, k=20, engine="driver")


def test_expand_covers_appends(spark, built, tmp_path):
    docs, _ = built
    from igd_spark.index import append_index

    path = str(tmp_path / "aexpidx")
    first = docs.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    second = docs.filter(F.crc32(F.col("conv_id")) % 2 == 1)
    build_index(spark, first, path, conf=CONF)
    idx = append_index(spark, path, second, batch_tag="xp1")
    t = _some_prefix(docs)
    q = spark.createDataFrame([(0, t[:3])], "query_id long, query_text string")
    want = _sorted(prefix_bm25_topk_indexed(spark, idx, q, k=30, round_dp=9,
                                            engine="spark"))
    got = _sorted(prefix_bm25_topk_indexed(spark, idx, q, k=30, round_dp=9,
                                           engine="driver"))
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0
