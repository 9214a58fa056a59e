"""Delete-by-query / tombstone lifecycle (Lucene deleted-docs semantics):
immediate result exclusion with FROZEN stats, snapshot isolation, tag
idempotency, driver==spark rank identity, and compact_index expunge ==
fresh rebuild over the surviving corpus."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    compact_index,
    delete_by_query,
    delete_docs,
    match_enumerate,
    open_index,
    phrase_match_indexed,
    search,
)
from igd_spark.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def conf():
    return IndexConf(
        block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4,
        store_positions=True,
    )


@pytest.fixture(scope="module")
def docs(spark, tiny_docs, conf):
    return assign_doc_ids(tiny_docs, conf).cache()


@pytest.fixture()
def idx_path(spark, docs, conf, tmp_path):
    path = str(tmp_path / "idx")
    build_index(spark, docs, path, conf=conf)
    return path


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def _q(spark, docs):
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    ts = term_stats(postings(docs)).filter((F.col("df") >= 15) & (F.col("df") <= 80))
    t1, t2 = [r["term"] for r in ts.orderBy("term").limit(2).collect()]
    return _queries(spark, [(0, f"{t1} {t2}"), (1, t1)]), t1, t2


def _sorted(pdf):
    return pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_tombstone_lifecycle(spark, docs, conf, idx_path):
    q, t1, t2 = _q(spark, docs)
    idx = open_index(spark, idx_path)
    pre = search(spark, idx, q, k=25, engine="spark").toPandas()
    dead = pre[(pre["query_id"] == 0) & (pre["rank"] <= 4)]["doc_id"].tolist()
    ids = spark.createDataFrame(pd.DataFrame({"doc_id": dead}))

    idx2 = delete_docs(spark, idx_path, ids, delete_tag="t1")
    assert idx2.tombstone_tags == ["t1"]
    assert idx2.tombstones_array().size == len(set(dead))

    # immediate exclusion on BOTH engines, rank-identical
    a = _sorted(search(spark, idx2, q, k=25, engine="spark").toPandas())
    b = _sorted(search(spark, idx2, q, k=25, engine="driver").toPandas())
    assert not set(dead) & set(a["doc_id"])
    assert a["doc_id"].equals(b["doc_id"])
    assert (abs(a["score"] - b["score"]) < 1e-9).all()

    # Lucene frozen-stats contract: surviving docs' scores bit-stable
    pre_map = {(r.query_id, r.doc_id): r.score for r in pre.itertuples()}
    for r in a.itertuples():
        if (r.query_id, r.doc_id) in pre_map:
            assert abs(pre_map[(r.query_id, r.doc_id)] - r.score) < 1e-12

    # snapshot isolation: the pre-delete handle still serves the docs
    old = search(spark, idx, q, k=25, engine="spark").toPandas()
    assert set(dead) & set(old["doc_id"])

    # enumeration + positional paths respect tombstones
    assert not set(dead) & {
        r["doc_id"] for r in match_enumerate(spark, idx2, q).collect()
    }
    ph = phrase_match_indexed(spark, idx2, _queries(spark, [(0, f"{t1} {t2}")]))
    assert not set(dead) & {r["doc_id"] for r in ph.collect()}

    # tag idempotency: replaying the same delete batch is a no-op
    idx3 = delete_docs(spark, idx_path, ids, delete_tag="t1")
    assert idx3.tombstone_tags == ["t1"]


def test_expunge_equals_fresh_rebuild(spark, docs, conf, idx_path, tmp_path):
    q, t1, _ = _q(spark, docs)
    idx = open_index(spark, idx_path)
    pre = search(spark, idx, q, k=20, engine="spark").toPandas()
    dead = pre[pre["rank"] <= 3]["doc_id"].drop_duplicates().tolist()
    ids = spark.createDataFrame(pd.DataFrame({"doc_id": dead}))
    delete_docs(spark, idx_path, ids, delete_tag="exp")

    idx2 = compact_index(spark, idx_path)
    assert idx2.tombstone_tags == [] and idx2.meta["deletes"] == 0
    post = _sorted(search(spark, idx2, q, k=20, engine="spark").toPandas())
    assert not set(dead) & set(post["doc_id"])

    fresh_path = str(tmp_path / "fresh")
    surv = docs.join(ids, "doc_id", "left_anti")
    fidx = build_index(spark, surv, fresh_path, conf=conf)
    fresh = _sorted(search(spark, fidx, q, k=20, engine="spark").toPandas())
    # expunged stats are recomputed → scores match a from-scratch build
    assert post["doc_id"].equals(fresh["doc_id"])
    assert (abs(post["score"] - fresh["score"]) < 1e-9).all()
    assert idx2.n_docs == fidx.n_docs
    assert abs(idx2.avgdl - fidx.avgdl) < 1e-9
    # dictionary df matches the fresh build's term by term
    d1 = {r["term"]: r["df"] for r in idx2.dictionary.collect()}
    d2 = {r["term"]: r["df"] for r in fidx.dictionary.collect()}
    assert d1 == d2


def test_delete_by_query_and_requery(spark, docs, conf, idx_path):
    q, t1, _ = _q(spark, docs)
    single = _queries(spark, [(0, t1)])
    idx = open_index(spark, idx_path)
    matched = {r["doc_id"] for r in match_enumerate(spark, idx, single).collect()}
    assert matched
    idx2 = delete_by_query(spark, idx_path, single, delete_tag="dbq")
    # every match is tombstoned: the term now returns nothing
    assert search(spark, idx2, single, k=10, engine="spark").count() == 0
    assert match_enumerate(spark, idx2, single).count() == 0
    # re-running the same delete-by-query sees an empty match set (no-op)
    idx3 = delete_by_query(spark, idx_path, single, delete_tag="dbq2")
    assert idx3.tombstones_array().size == len(matched)


def test_append_refuses_tombstoned_ids(spark, docs, conf, idx_path):
    from igd_spark import append_index

    q, t1, _ = _q(spark, docs)
    idx = open_index(spark, idx_path)
    victim = search(spark, idx, q, k=1, engine="spark").collect()[0]["doc_id"]
    delete_docs(
        spark, idx_path,
        spark.createDataFrame([(int(victim),)], "doc_id long"),
        delete_tag="readd",
    )
    readd = docs.filter(F.col("doc_id") == victim)
    with pytest.raises(ValueError, match="tombstoned"):
        append_index(spark, idx_path, readd, batch_tag="readd_batch")
    # after expunge the id is free again
    compact_index(spark, idx_path)
    idx2 = append_index(spark, idx_path, readd, batch_tag="readd_batch2")
    assert victim in {
        r["doc_id"] for r in search(spark, idx2, q, k=25, engine="spark").collect()
    }


def test_expunge_shrinks_n_salts(spark, tiny_docs, tmp_path):
    """Deleting all of a hot term's postings in the upper salts must shrink
    the rebuilt dictionary's n_salts to max surviving salt + 1."""
    cf = IndexConf(block_size=16, n_shards=4, salt_df_threshold=8, max_salts=4)
    docs = assign_doc_ids(tiny_docs, cf).cache()
    path = str(tmp_path / "salted")
    idx = build_index(spark, docs, path, conf=cf)
    hot = (
        idx.dictionary.filter(F.col("n_salts") > 1)
        .orderBy(F.desc("df"), "term").limit(1).collect()
    )
    assert hot, "fixture must produce at least one salted term"
    term, old_salts = hot[0]["term"], int(hot[0]["n_salts"])
    seg = idx.segments.filter(F.col("term") == term)
    salts = sorted(r["salt"] for r in seg.select("salt").distinct().collect())
    assert len(salts) > 1, "hot term must physically span multiple salts"
    # pick the SURVIVOR from the minimum salt's blocks (first_doc is a doc
    # known to live there), so after deleting every other posting of the
    # term only min-salt blocks survive and the recompute MUST strictly
    # shrink n_salts to min_salt + 1
    min_salt = salts[0]
    survivor = int(
        seg.filter(F.col("salt") == min_salt)
        .orderBy("block_id").limit(1).collect()[0]["first_doc"]
    )
    from igd_spark import match_enumerate

    q = spark.createDataFrame([(0, term)], "query_id long, query_text string")
    all_ids = {r["doc_id"] for r in
               match_enumerate(spark, idx, q).select("doc_id").distinct().collect()}
    dead = sorted(all_ids - {survivor})
    delete_docs(spark, path, spark.createDataFrame([(i,) for i in dead], "doc_id long"))
    idx2 = compact_index(spark, path)
    row = idx2.dictionary.filter(F.col("term") == term).collect()
    assert row, "one posting survives"
    assert row[0]["df"] == 1
    # strict pin of the recompute: max surviving salt + 1, smaller than before
    assert int(row[0]["n_salts"]) == min_salt + 1
    assert int(row[0]["n_salts"]) < old_salts
