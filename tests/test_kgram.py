"""k-gram dictionary index: pattern-gram extraction, pruned-expansion
parity with the LIKE-scan wildcard paths, fallback patterns, and exactness
across un-covered append batches (the staleness union)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import IndexConf, build_index
from igd_spark.corpus import assign_doc_ids
from igd_spark.kgram import (
    build_kgram_index,
    pattern_grams,
    wildcard_bm25_topk_kgram,
)
from igd_spark.querylang import wildcard_bm25_topk
from igd_spark.stats import term_stats
from igd_spark.tokenizer import postings

K = 10


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


@pytest.fixture(scope="module")
def kidx(spark, docs, tmp_path_factory):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path_factory.mktemp("kgidx") / "idx")
    idx = build_index(spark, docs, path, conf=conf)
    build_kgram_index(spark, idx, k=3, n_gbuckets=16)
    return idx


def _sorted(df):
    return df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)


def _vocab(docs, n=8, min_len=5):
    ts = term_stats(postings(docs)).filter(F.length("term") >= min_len)
    return [r["term"] for r in ts.orderBy("term").limit(n).collect()]


# ---------------------------------------------------------------------------
# pattern_grams
# ---------------------------------------------------------------------------


def test_pattern_grams_anchoring():
    # boundary sentinels make prefix/suffix runs prunable
    assert pattern_grams("ta*e", 3) == ["^ta"]
    assert pattern_grams("*ble", 3) == ["ble", "le$"]
    assert pattern_grams("tab*", 3) == ["^ta", "tab"]


def test_pattern_grams_question_breaks_continuity():
    # '?' matches one char but a gram cannot span it
    assert pattern_grams("qu?ry", 3) == ["^qu", "ry$"]
    # runs shorter than k on both sides -> unprunable
    assert pattern_grams("a?b", 3) == []


def test_pattern_grams_unprunable():
    assert pattern_grams("*", 3) == []
    assert pattern_grams("??", 3) == []


def test_pattern_grams_plain_term_covers_whole_term():
    gs = pattern_grams("table", 3)
    assert "^ta" in gs and "le$" in gs and "abl" in gs


# ---------------------------------------------------------------------------
# parity with the corpus-scan wildcard operator
# ---------------------------------------------------------------------------


def test_kgram_matches_corpus_wildcard(spark, docs, kidx):
    t = _vocab(docs, 6)
    rows = [
        (0, t[0][:2] + "*" + t[0][-1]),       # infix
        (1, t[1][:-1] + "?"),                  # single-char
        (2, "*" + t[2][-3:]),                  # leading wildcard
        (3, t[3][:3] + "*"),                   # prefix
        (4, "zzz*"),                           # expands to nothing
    ]
    qs = spark.createDataFrame(rows, "query_id long, query_text string")
    a = _sorted(wildcard_bm25_topk(docs, qs, k=K, round_dp=6))
    b = _sorted(wildcard_bm25_topk_kgram(spark, kidx, qs, k=K, round_dp=6))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0


def test_kgram_fallback_patterns_still_exact(spark, docs, kidx):
    # '??' has no extractable gram -> dictionary-scan fallback, same result
    t = _vocab(docs, 1)
    qs = spark.createDataFrame(
        [(0, "??"), (1, t[0][:3] + "* ??")],
        "query_id long, query_text string",
    )
    a = _sorted(wildcard_bm25_topk(docs, qs, k=K, round_dp=6))
    b = _sorted(wildcard_bm25_topk_kgram(spark, kidx, qs, k=K, round_dp=6))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_kgram_refuses_without_table(spark, docs, tmp_path):
    idx = build_index(
        spark, docs, str(tmp_path / "noidx"),
        conf=IndexConf(block_size=32, n_shards=4),
    )
    qs = spark.createDataFrame([(0, "ta*")], "query_id long, query_text string")
    with pytest.raises(ValueError, match="kgram"):
        wildcard_bm25_topk_kgram(spark, idx, qs)


# ---------------------------------------------------------------------------
# append staleness: exactness between kgram rebuilds
# ---------------------------------------------------------------------------


def test_kgram_exact_across_uncovered_append(spark, docs, tmp_path):
    from igd_spark import append_index, open_index

    conf = IndexConf(block_size=32, n_shards=8)
    path = str(tmp_path / "appidx")
    idx = build_index(spark, docs, path, conf=conf)
    build_kgram_index(spark, idx, k=3, n_gbuckets=16)

    new = spark.createDataFrame(
        [("zc", i, "user", "zzznovelterm quickbrownfox zzznovelterm", "none")
         for i in range(3)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    new = assign_doc_ids(new)
    append_index(spark, path, new, batch_tag="t1")

    idx2 = open_index(spark, path)          # batch t1 NOT covered by kgrams
    docs2 = docs.unionByName(new.select(*docs.columns))
    qs = spark.createDataFrame(
        [(0, "zzznovel*"), (1, "quickbrown*fox"), (2, "*fox")],
        "query_id long, query_text string",
    )
    a = _sorted(wildcard_bm25_topk(docs2, qs, k=K, round_dp=6))
    b = _sorted(wildcard_bm25_topk_kgram(spark, idx2, qs, k=K, round_dp=6))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) >= 3  # the appended vocab is actually found

    # rebuild re-covers the batch: same answers, no live-derivation branch
    build_kgram_index(spark, idx2, k=3, n_gbuckets=16)
    idx3 = open_index(spark, path)
    c = _sorted(wildcard_bm25_topk_kgram(spark, idx3, qs, k=K, round_dp=6))
    pd.testing.assert_frame_equal(a, c, check_dtype=False)


def test_kgram_crash_marker_discipline(spark, docs, tmp_path):
    """A marker-less kgrams dir (crash mid-rebuild) is refused, never
    silently served."""
    import os

    conf = IndexConf(block_size=32, n_shards=4)
    path = str(tmp_path / "crashidx")
    idx = build_index(spark, docs, path, conf=conf)
    build_kgram_index(spark, idx, k=3, n_gbuckets=8)
    os.remove(os.path.join(path, "_lineage", "kgrams.json"))
    qs = spark.createDataFrame([(0, "ta*")], "query_id long, query_text string")
    with pytest.raises(ValueError, match="kgram"):
        wildcard_bm25_topk_kgram(spark, idx, qs)
