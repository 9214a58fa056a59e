"""Driver-side single-query path (igd_spark.local): must be rank- and
score-identical to the distributed scorer, cover append batches, and run
without launching any Spark job."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from igd_spark import IndexConf, build_index, search, search_one
from igd_spark.corpus import assign_doc_ids
from igd_spark.index import append_index

CONF = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)

QUERIES = ["error timeout", "t00000", "the import hash", "zzznope", "", "t00001 t00001"]


def _key(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.fixture(scope="module")
def built(spark, tiny_docs, tmp_path_factory):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    path = str(tmp_path_factory.mktemp("lidx") / "idx")
    return docs, build_index(spark, docs, path, conf=CONF)


def test_driver_path_matches_spark_path(spark, built):
    _, idx = built
    for q in QUERIES:
        got = _key(search_one(spark, idx, q, k=10, engine="driver"))
        want = _key(search_one(spark, idx, q, k=10, engine="spark"))
        assert got == want, q


def test_driver_path_min_tf(spark, built):
    _, idx = built
    got = _key(search_one(spark, idx, "the import", k=10, min_tf=2, engine="driver"))
    want = _key(search_one(spark, idx, "the import", k=10, min_tf=2, engine="spark"))
    assert got == want


def test_driver_path_covers_appends(spark, built, tmp_path):
    docs, _ = built
    path = str(tmp_path / "alidx")
    first = docs.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    second = docs.filter(F.crc32(F.col("conv_id")) % 2 == 1)
    build_index(spark, first, path, conf=CONF)
    idx = append_index(spark, path, second, batch_tag="lb1")
    q = spark.createDataFrame([(0, "error timeout")], "query_id long, query_text string")
    want = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in search(spark, idx, q, k=10).collect()
    ]
    assert _key(search_one(spark, idx, "error timeout", k=10, engine="driver")) == want


def test_driver_path_launches_no_jobs(spark, built):
    """The whole point: interactive latency without cluster scheduling.
    Assert zero Spark jobs via the status tracker, and a sane wall time
    (loose bound — the VM is noisy; BENCH.md records the real p50)."""
    _, idx = built
    from igd_spark.local import local_searcher

    ls = local_searcher(idx)
    ls.search_one("error timeout", k=10)  # warm the dictionary cache
    tracker = spark.sparkContext.statusTracker()
    jobs_before = tracker.getJobIdsForGroup(None)
    t0 = time.time()
    out = ls.search_one("error timeout deploy", k=10)
    dt = time.time() - t0
    assert len(out) > 0
    assert tracker.getJobIdsForGroup(None) == jobs_before  # no Spark job ran
    assert dt < 2.0, f"driver path took {dt:.2f}s"
