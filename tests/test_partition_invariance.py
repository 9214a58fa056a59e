"""Parallelism invariance: the answers must not depend on how the input
is partitioned or how many shuffle partitions the session uses — the
precondition for the N->4N scaling criterion to be about throughput
only.  Scores are compared at the gate's 6-dp rounding contract
(float-sum order across partitions legitimately differs in ulps), and
k is set past the match-set size so boundary ties cannot flip the
membership being compared."""

from __future__ import annotations

import pytest

from igd_spark import IndexConf, build_index, exact_bm25_topk, search
from igd_spark.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


def _q(spark):
    return spark.createDataFrame(
        [(0, "error timeout"), (1, "deploy rollback"), (2, "t00000")],
        "query_id long, query_text string",
    )


def _scored_set(df):
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 6)) for r in df.collect()
    )


def test_build_and_search_partition_invariance(spark, docs, tmp_path_factory):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results, stats = [], []
    try:
        for nparts, shuffle in ((2, "3"), (16, "17")):
            spark.conf.set("spark.sql.shuffle.partitions", shuffle)
            path = str(tmp_path_factory.mktemp(f"pinv{nparts}") / "idx")
            idx = build_index(
                spark, docs.repartition(nparts), path, conf=conf
            )
            results.append(
                _scored_set(search(spark, idx, _q(spark), k=1000))
            )
            c = idx.meta["corpus"]
            stats.append((int(c["n_docs"]), int(c["sum_dl"])))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1]
    assert results[0]
    assert stats[0] == stats[1]


def test_corpus_scan_partition_invariance(spark, docs):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _scored_set(exact_bm25_topk(docs.repartition(2), _q(spark), k=1000))
        spark.conf.set("spark.sql.shuffle.partitions", "19")
        b = _scored_set(exact_bm25_topk(docs.repartition(16), _q(spark), k=1000))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
    assert a


def test_dedup_partition_invariance(spark, docs):
    from igd_spark.dedup import exact_dedup

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(r["doc_id"] for r in exact_dedup(docs.repartition(2)).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "19")
        b = sorted(r["doc_id"] for r in exact_dedup(docs.repartition(16)).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
    assert a
