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


def test_match_phrase_prefix_parity_and_semantics(spark, pos_index):
    """ES match_phrase_prefix: indexed twin == corpus scan at several cap
    values; full-term prefix degenerates to phrase_match; empty expansion
    yields zero rows."""
    from igd_spark import match_phrase_prefix, match_phrase_prefix_indexed

    docs, _, idx = pos_index
    rows = [
        (0, "t00000 time"),  # literal + prefix -> timeout
        (1, "t0000"),        # pure prefix: t00000..t00009 expansions
        (2, "error zzz"),    # prefix expands to nothing
    ]
    ph = spark.createDataFrame(rows, "query_id long, query_text string")
    for me in (4, 50):
        want = _key(match_phrase_prefix(docs, ph, max_expansions=me, conf=CONF))
        for eng in ("spark", "driver"):  # distributed plan AND in-process route
            got = _key(
                match_phrase_prefix_indexed(
                    spark, idx, ph, max_expansions=me, engine=eng
                )
            )
            assert got == want, f"max_expansions={me}, engine={eng}"
            assert not [r for r in got if r[0] == 2]  # no-expansion query: 0 rows
    # prefix == a full vocab term whose expansion set is exactly itself
    # ("timeout" is the only term starting with "timeout"): must equal
    # the plain phrase
    ph2 = spark.createDataFrame(
        [(0, "error timeout")], "query_id long, query_text string"
    )
    assert _key(match_phrase_prefix(docs, ph2, conf=CONF)) == _key(
        phrase_match(docs, ph2, conf=CONF)
    )


def test_match_phrase_prefix_cap_is_term_order(spark, pos_index):
    """With the cap binding, the kept expansions are the lexicographically
    FIRST terms (the Lucene TermsEnum order contract): cap=2 on 't0000' ==
    the per-doc sum of the single-term phrases 't00000' + 't00001'."""
    from collections import Counter

    from igd_spark import match_phrase_prefix_indexed

    docs, _, idx = pos_index
    ph = spark.createDataFrame([(0, "t0000")], "query_id long, query_text string")
    got = set(_key(match_phrase_prefix_indexed(spark, idx, ph, max_expansions=2)))
    want: Counter = Counter()
    for t in ("t00000", "t00001"):
        one = spark.createDataFrame([(0, t)], "query_id long, query_text string")
        for _, d, n in _key(phrase_match(docs, one, conf=CONF)):
            want[d] += n
    assert got == {(0, d, n) for d, n in want.items()}


def test_intervals_semantics_and_parity(spark, pos_index):
    """ES intervals (ordered, max_gaps): max_gaps=0 degenerates to the
    phrase contract (anchors == exact occurrences, min_gaps 0); matches
    grow monotonically with the gap budget; indexed twin == corpus scan."""
    from igd_spark import intervals_match, intervals_match_indexed

    docs, _, idx = pos_index
    ph = spark.createDataFrame(
        [(0, "error timeout"), (1, "the import"), (2, "t00000")],
        "query_id long, query_text string",
    )
    tight = intervals_match(docs, ph, max_gaps=0, conf=CONF)
    want_phrase = _key(phrase_match(docs, ph, conf=CONF))
    got_phrase = sorted(
        (r["query_id"], r["doc_id"], r["n_anchors"]) for r in tight.collect()
    )
    assert got_phrase == want_phrase
    assert all(r["min_gaps"] == 0 for r in tight.collect())

    loose = intervals_match(docs, ph, max_gaps=3, conf=CONF)
    t_set = {(r["query_id"], r["doc_id"]) for r in tight.collect()}
    l_set = {(r["query_id"], r["doc_id"]) for r in loose.collect()}
    assert t_set <= l_set  # the gap budget only ever ADDS matches
    # strict growth is pinned on a constructed doc (order test below);
    # anchors can only grow per retained doc
    t_anch = {(r["query_id"], r["doc_id"]): r["n_anchors"] for r in tight.collect()}
    l_anch = {(r["query_id"], r["doc_id"]): r["n_anchors"] for r in loose.collect()}
    assert all(l_anch[k] >= v for k, v in t_anch.items())

    def key4(df):
        return sorted(
            (r["query_id"], r["doc_id"], r["n_anchors"], r["min_gaps"])
            for r in df.collect()
        )

    for mg in (0, 2):
        a = key4(intervals_match(docs, ph, max_gaps=mg, conf=CONF))
        for eng in ("spark", "driver"):  # distributed plan AND in-process route
            b = key4(
                intervals_match_indexed(spark, idx, ph, max_gaps=mg, engine=eng)
            )
            assert a == b, f"max_gaps={mg}, engine={eng}"


def test_intervals_order_matters(spark, pos_index):
    """'x y' and 'y x' are different ordered intervals: build a probe doc
    pair where only one direction fits the budget."""
    from igd_spark import intervals_match

    rows = [
        (100, "alpha beta gap gap gap beta"),  # alpha..beta ordered, gaps 0 AND 4
        (101, "beta gap alpha"),               # beta..alpha ordered, 1 gap
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fwd = spark.createDataFrame([(0, "alpha beta")], "query_id long, query_text string")
    rev = spark.createDataFrame([(0, "beta alpha")], "query_id long, query_text string")
    f = {(r["doc_id"]): (r["n_anchors"], r["min_gaps"])
         for r in intervals_match(d, fwd, max_gaps=1).collect()}
    r_ = {(r["doc_id"]): (r["n_anchors"], r["min_gaps"])
          for r in intervals_match(d, rev, max_gaps=1).collect()}
    assert f == {100: (1, 0)}     # only the adjacent pair fits gaps<=1
    assert r_ == {101: (1, 1)}    # reversed matches only the other doc


def test_span_not_semantics_and_indexed_identity(spark, tiny_docs, tmp_path_factory):
    from igd_spark import (
        IndexConf, build_index, span_not_match, span_not_match_indexed,
    )
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.search import positional_postings
    from igd_spark import analyze  # noqa: F401

    docs = assign_doc_ids(tiny_docs).cache()
    q = spark.createDataFrame(
        [(0, "error"), (1, "deploy")], "query_id long, query_text string"
    )
    # brute force: include occs minus those with an exclude occ in window
    occ = positional_postings(docs).collect()
    by_doc: dict = {}
    for r in occ:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["pos"]))
    pre, post = 2, 2

    def brute(inc_t, exc_t):
        out = {}
        for d, toks in by_doc.items():
            incs = [p for t, p in toks if t == inc_t]
            excs = [p for t, p in toks if t == exc_t]
            n = sum(
                1 for p in incs
                if not any(p - pre <= e <= p + post for e in excs)
            )
            if n:
                out[d] = n
        return out

    got = {
        (r["query_id"], r["doc_id"]): r["n_hits"]
        for r in span_not_match(docs, q, "timeout", pre=pre, post=post).collect()
    }
    for qid, term in ((0, "error"), (1, "deploy")):
        expect = brute(term, "timeout")
        assert {d: n for (g, d), n in got.items() if g == qid} == expect

    # excluding a term absent everywhere keeps every occurrence
    allkept = {
        (r["query_id"], r["doc_id"]): r["n_hits"]
        for r in span_not_match(docs, q, "zzzznotaterm", pre=1, post=1).collect()
    }
    plain = {
        (r["query_id"], r["doc_id"]): r["n_hits"]
        for r in span_not_match(docs, q, "timeout", pre=0, post=0).collect()
        # pre=post=0 with distinct terms never collides either
    }
    assert allkept == plain

    conf = IndexConf(block_size=32, n_shards=4, store_positions=True)
    path = str(tmp_path_factory.mktemp("spannot") / "idx")
    idx = build_index(spark, docs, path, conf=conf)
    a = span_not_match(docs, q, "timeout", pre=pre, post=post, conf=conf).collect()
    b = span_not_match_indexed(spark, idx, q, "timeout", pre=pre, post=post).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        span_not_match(docs, q, "timeout", pre=-1)
