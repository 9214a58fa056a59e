"""Index persistence lifecycle: lineage-based resume (the (i0,L0) cursor
analog, src/igd_create.c:73-88), existing-db guard (B9), introspection API
(A7 analog, IGDr/R/IGDr.R:86-159)."""

from __future__ import annotations

import json
import os

import pytest

from igd_spark import IndexConf, build_index, open_index, search
from igd_spark.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def built(spark, tiny_docs, tmp_path_factory):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    docs = assign_doc_ids(tiny_docs, conf).cache()
    path = str(tmp_path_factory.mktemp("lifecycle") / "idx")
    idx = build_index(spark, docs, path, conf=conf)
    return conf, docs, path, idx


def test_existing_db_guard(spark, built):
    conf, docs, path, _ = built
    with pytest.raises(FileExistsError):
        build_index(spark, docs, path, conf=conf)


def test_lineage_written_per_stage(built):
    _, _, path, _ = built
    for stage in ("doc_stats", "dictionary", "segments"):
        p = os.path.join(path, "_lineage", f"{stage}.json")
        assert os.path.exists(p)
        payload = json.load(open(p))
        assert payload["stage"] == stage and "secs" in payload


def test_resume_skips_committed_stages_and_is_identical(spark, built):
    conf, docs, path, idx = built
    queries = spark.createDataFrame(
        [(0, "error timeout"), (1, "t00000")], "query_id long, query_text string"
    )
    before = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in search(spark, idx, queries, k=5).collect()
    )
    # simulate a crash mid-merge: segments lineage marker lost
    os.remove(os.path.join(path, "_lineage", "segments.json"))
    mtime_dict = os.path.getmtime(os.path.join(path, "_lineage", "dictionary.json"))
    idx2 = build_index(spark, docs, path, conf=conf, resume=True)
    # committed stages untouched, segments recommitted
    assert os.path.getmtime(os.path.join(path, "_lineage", "dictionary.json")) == mtime_dict
    assert os.path.exists(os.path.join(path, "_lineage", "segments.json"))
    after = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in search(spark, idx2, queries, k=5).collect()
    )
    assert after == before


def test_introspection(spark, built):
    conf, docs, path, idx = built
    idx = open_index(spark, path)
    assert idx.n_shards() == conf.n_shards
    assert idx.block_size() == conf.block_size
    assert idx.n_docs == docs.count()
    # pick a probe term that exists
    df = idx.term_df("error")
    assert df > 0
    assert idx.term_id("error") != 0
    n0 = idx.block_len("error", 0)
    assert 0 < n0 <= conf.block_size
    doc_ids, tfs = idx.block_postings("error", 0)
    assert len(doc_ids) == n0 == len(tfs)
    assert (tfs > 0).all()
    # unknown term behaves like unknown contig (0 hits, src/igd_search.c:456-458)
    assert idx.term_df("zzz-unknown") == 0
    assert idx.block_len("zzz-unknown", 0) == 0
