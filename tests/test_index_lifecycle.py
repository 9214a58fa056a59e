"""Index persistence lifecycle: lineage-based resume (the (i0,L0) cursor
analog, src/igd_create.c:73-88), existing-db guard (B9), introspection API
(A7 analog, IGDr/R/IGDr.R:86-159)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

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


def test_search_one_and_file_list_build(spark, tiny_docs, tmp_path):
    """search_1 + create-from-file-list analogs (src_py/igd_py.pyx:31-38,
    src/igd_create.c:130-166): a multi-file drop builds the same index a
    single-table build does, and search_one == search on a 1-row set."""
    from igd_spark import IndexConf, create_from_files, search, search_one

    conf = IndexConf(block_size=32, n_shards=8)
    drops = str(tmp_path / "drops")
    tiny_docs.repartition(4).write.parquet(drops)
    import glob as _glob

    files = sorted(_glob.glob(drops + "/*.parquet"))
    assert len(files) >= 2
    idx = create_from_files(spark, files, str(tmp_path / "flidx"), conf=conf)
    one = search_one(spark, idx, "error timeout", k=5).collect()
    assert [r["rank"] for r in one] == list(range(1, len(one) + 1))
    q = spark.createDataFrame([(0, "error timeout")], "query_id long, query_text string")
    full = search(spark, idx, q, k=5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in sorted(one, key=lambda r: r["rank"])] == [
        (r["rank"], r["doc_id"], r["score"]) for r in sorted(full, key=lambda r: r["rank"])
    ]


def test_hitsmap_csv_sink(spark, tiny_docs, tmp_path):
    import glob as _glob

    from igd_spark import term_cooccurrence, write_hitsmap_csv

    m = term_cooccurrence(tiny_docs.withColumn("doc_id", F.monotonically_increasing_id()), min_df=20)
    out = str(tmp_path / "hitsmap")
    write_hitsmap_csv(m, out)
    files = _glob.glob(out + "/*.csv")
    assert len(files) == 1
    header = open(files[0]).readline().strip().split(",")
    assert header == ["term_a", "term_b", "n_docs"]


def test_distributed_search_path_matches_fast_path(spark, tiny_docs, tmp_path, monkeypatch):
    """The unbounded (huge-batch) search path — no driver-side query map,
    join-only pruning — must return exactly the fast path's results."""
    from igd_spark import IndexConf, build_index
    from igd_spark import search as search_fn

    conf = IndexConf(block_size=32, n_shards=8)
    docs = assign_doc_ids(tiny_docs, conf)
    idx = build_index(spark, docs, str(tmp_path / "dpidx"), conf=conf)
    queries = spark.createDataFrame(
        [(0, "error timeout"), (1, "t00000 t00042"), (2, "deploy")],
        "query_id long, query_text string",
    )
    fast = sorted(tuple(r) for r in search_fn(spark, idx, queries, k=10).collect())
    monkeypatch.setenv("IGD_SEARCH_SMALL_MAX_ROWS", "0")  # force distributed path
    dist = sorted(tuple(r) for r in search_fn(spark, idx, queries, k=10).collect())
    assert dist == fast and len(fast) > 0
