"""Parent/child join queries (ES has_child / has_parent): score-mode
roll-ups vs the group scorer, min/max_children bounds, the unscored filter
contexts, parent-score inheritance, and indexed-twin rank identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    conv_bm25_topk,
    has_child_topk,
    has_child_topk_indexed,
    has_parent_topk,
    has_parent_topk_indexed,
)
from igd_spark.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


@pytest.fixture(scope="module")
def pc_idx(spark, docs, tmp_path_factory):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path_factory.mktemp("pcidx") / "idx")
    return build_index(spark, docs, path, conf=conf)


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_has_child_sum_equals_conv_rollup(spark, docs):
    q = _queries(spark, [(0, "error timeout")])
    hc = has_child_topk(docs, q, score_mode="sum", k=5, round_dp=6).collect()
    cv = conv_bm25_topk(docs, q, agg="sum", k=5, round_dp=6).collect()
    assert [(r["parent_id"], r["score"]) for r in hc] == [
        (r["group"], r["score"]) for r in cv
    ]


def test_has_child_min_children_binds(spark, docs):
    q = _queries(spark, [(0, "error")])
    loose = has_child_topk(docs, q, k=1000, min_children=1).collect()
    tight = has_child_topk(docs, q, k=1000, min_children=2).collect()
    assert {r["parent_id"] for r in tight} == {
        r["parent_id"] for r in loose if r["n_children"] >= 2
    }
    assert len(tight) < len(loose)
    cap = has_child_topk(docs, q, k=1000, max_children=1).collect()
    assert all(r["n_children"] == 1 for r in cap)


def test_has_child_score_mode_none_is_filter(spark, docs):
    q = _queries(spark, [(0, "error")])
    out = has_child_topk(docs, q, score_mode="none", k=5).collect()
    assert all(r["score"] == 0.0 for r in out)
    ids = [r["parent_id"] for r in out]
    assert ids == sorted(ids)  # rank falls back to parent_id asc
    with pytest.raises(ValueError):
        has_child_topk(docs, q, score_mode="median")


def test_has_child_indexed_identity(spark, docs, pc_idx):
    q = _queries(spark, [(0, "error timeout"), (1, "deploy")])
    parents = docs.select("doc_id", F.col("conv_id").alias("parent_id"))
    for mode in ("max", "sum", "avg", "none"):
        a = has_child_topk(
            docs, q, score_mode=mode, k=8, round_dp=6, conf=pc_idx.conf
        ).collect()
        b = has_child_topk_indexed(
            spark, pc_idx, q, parents, score_mode=mode, k=8, round_dp=6
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), mode


def _parent_frames(docs):
    # parent doc = the conversation's first turn, keyed by conv_id
    parent_docs = (
        docs.filter(F.col("turn_idx") == 0).select("conv_id", "text")
    )
    children = docs.select("doc_id", "conv_id")
    return parent_docs, children


def test_has_parent_inherits_parent_score(spark, docs):
    parent_docs, children = _parent_frames(docs)
    q = _queries(spark, [(0, "error")])
    out = has_parent_topk(
        parent_docs, children, q, k=1000, round_dp=6
    ).collect()
    assert out, "first turns must contain the probe term somewhere"
    # all children of one parent share that parent's score
    by_parent: dict = {}
    for r in out:
        by_parent.setdefault(r["parent_id"], set()).add(r["score"])
    assert all(len(s) == 1 for s in by_parent.values())
    # unscored filter mode: score 0, doc_id order
    flt = has_parent_topk(parent_docs, children, q, k=1000, score=False).collect()
    assert all(r["score"] == 0.0 for r in flt)
    ids = [r["doc_id"] for r in flt]
    assert ids == sorted(ids)
    assert {r["doc_id"] for r in flt} == {r["doc_id"] for r in out}


def test_has_parent_indexed_identity(spark, docs, tmp_path_factory):
    parent_docs, children = _parent_frames(docs)
    conf = IndexConf(block_size=32, n_shards=4)
    # index over the PARENT table: doc_id = conv key interned to a long id
    pd_docs = parent_docs.withColumn(
        "pid", F.xxhash64(F.col("conv_id"))
    )
    path = str(tmp_path_factory.mktemp("paridx") / "idx")
    idx = build_index(
        spark, pd_docs.select(F.col("pid").alias("doc_id"), "text"), path, conf=conf
    )
    ch = children.withColumn("parent_id", F.xxhash64(F.col("conv_id"))).select(
        "doc_id", "parent_id"
    )
    q = _queries(spark, [(0, "error")])
    a = has_parent_topk(
        pd_docs.select(F.col("pid").alias("conv_id"), "text"),
        ch.withColumnRenamed("parent_id", "conv_id"),
        q, k=50, round_dp=6, conf=conf,
    ).collect()
    b = has_parent_topk_indexed(spark, idx, q, ch, k=50, round_dp=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
