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
