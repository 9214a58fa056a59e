"""Persistent positional index (store_positions=True): phrase_match_indexed
must equal the corpus-scan phrase_match on every phrase shape — including
duplicate terms in the phrase and multi-occurrence docs — and must keep
covering documents added by append_index and survive compaction."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    open_index,
    phrase_match,
    phrase_match_indexed,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.index import append_index, compact_index

CONF = IndexConf(
    block_size=32,
    n_shards=8,
    salt_df_threshold=64,
    max_salts=4,
    store_positions=True,
)


def _phrases(spark):
    rows = [
        (0, "the import"),          # common bigram
        (1, "error timeout"),       # probe terms
        (2, "the the"),             # duplicate term in phrase
        (3, "t00000"),              # single-term phrase
        (4, "no such phrase zz"),   # zero hits
    ]
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _key(df):
    return sorted((r["query_id"], r["doc_id"], r["n_hits"]) for r in df.collect())


@pytest.fixture(scope="module")
def pos_index(spark, tiny_docs, tmp_path_factory):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    path = str(tmp_path_factory.mktemp("posidx") / "idx")
    idx = build_index(spark, docs, path, conf=CONF)
    return docs, path, idx


def test_phrase_indexed_matches_corpus_scan(spark, pos_index):
    docs, _, idx = pos_index
    ph = _phrases(spark)
    got = _key(phrase_match_indexed(spark, idx, ph))
    want = _key(phrase_match(docs, ph, conf=CONF))
    assert got == want and len(want) > 0
    # the zero-hit phrase really has zero hits in both
    assert not any(q == 4 for q, _, _ in got)


def test_phrase_indexed_oov_only(spark, pos_index):
    _, _, idx = pos_index
    ph = spark.createDataFrame([(9, "zzznope qqnope")], "query_id long, query_text string")
    assert phrase_match_indexed(spark, idx, ph).count() == 0


def test_positions_require_flag(spark, tiny_docs, tmp_path):
    conf = IndexConf(block_size=32, n_shards=8)
    docs = assign_doc_ids(tiny_docs, conf)
    path = str(tmp_path / "noposidx")
    idx = build_index(spark, docs, path, conf=conf)
    with pytest.raises(ValueError, match="store_positions"):
        idx.positions  # noqa: B018


def test_phrase_indexed_covers_appends_and_compact(spark, pos_index, tmp_path):
    docs, _, _ = pos_index
    path = str(tmp_path / "apposidx")
    first = docs.filter(F.crc32(F.col("conv_id")) % 2 == 0).cache()
    second = docs.filter(F.crc32(F.col("conv_id")) % 2 == 1).cache()
    build_index(spark, first, path, conf=CONF)
    idx = append_index(spark, path, second, batch_tag="p1")
    ph = _phrases(spark)
    want = _key(phrase_match(docs, ph, conf=CONF))
    assert _key(phrase_match_indexed(spark, idx, ph)) == want
    # compaction merges positional blocks and preserves results
    idx2 = compact_index(spark, path)
    assert _key(phrase_match_indexed(spark, idx2, ph)) == want
    assert os.path.isdir(os.path.join(path, "positions"))


def test_analyzer_filtered_terms_match_literally_indexed(spark, tiny_docs, tmp_path):
    """config.py contract: positions keep the RAW token stream — a phrase /
    span / enumeration containing an analyzer-removed term must match the
    docs that literally contain it, identically on the corpus-scan and
    persisted-index paths (the dictionary join must not silently drop it)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from igd_spark import (
        IndexConf,
        build_index,
        phrase_match,
        phrase_match_indexed,
        span_first_match,
        span_first_match_indexed,
    )
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.search import positional_enumerate, positional_postings

    # stopword = the corpus's most frequent raw token, so the test is
    # fixture-independent and the word is guaranteed to occur
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    base = assign_doc_ids(tiny_docs).cache()
    stop = (
        term_stats(postings(base)).orderBy(F.desc("df"), "term")
        .limit(1).collect()[0]["term"]
    )
    conf = IndexConf(
        block_size=16, n_shards=4, store_positions=True,
        stopwords=(stop,), min_token_len=1,
    )
    docs = assign_doc_ids(tiny_docs, conf).cache()
    idx = build_index(spark, docs, str(tmp_path / "idx"), conf=conf)
    assert idx.dictionary.filter(F.col("term") == stop).count() == 0, \
        "the stopword must be analyzer-removed from the logical dictionary"

    # find a real bigram (stop, next) in the raw stream, so the phrase
    # "<stop> x" exercises the literal path
    occ = positional_postings(docs, conf=conf)
    stop_occ = occ.filter(F.col("term") == stop).limit(1).collect()
    assert stop_occ, "most frequent token must occur"
    d0, p0 = stop_occ[0]["doc_id"], stop_occ[0]["pos"]
    nxt = occ.filter((F.col("doc_id") == d0) & (F.col("pos") == p0 + 1)).collect()
    assert nxt, "raw stream must have a following token"
    phrase = f"{stop} {nxt[0]['term']}"
    ph = spark.createDataFrame([(0, phrase)], "query_id long, query_text string")

    a = phrase_match(docs, ph, conf=conf).toPandas().sort_values("doc_id")
    b = phrase_match_indexed(spark, idx, ph).toPandas().sort_values("doc_id")
    assert len(a) > 0, "the literal phrase occurs in the fixture"
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )

    # span + enumeration: the stopword query term resolves on both paths
    q = spark.createDataFrame([(0, stop)], "query_id long, query_text string")
    sa = span_first_match(docs, q, 5, conf=conf).toPandas().sort_values("doc_id")
    sb = span_first_match_indexed(spark, idx, q, 5).toPandas().sort_values("doc_id")
    assert len(sa) > 0
    pd.testing.assert_frame_equal(
        sa.reset_index(drop=True), sb.reset_index(drop=True), check_dtype=False
    )
    n_raw = occ.filter(F.col("term") == stop).count()
    assert positional_enumerate(spark, idx, q).count() == n_raw
