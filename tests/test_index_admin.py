"""Index administration surface: multi-field retrieval, _stats
introspection, and snapshot/restore."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    delete_docs,
    exact_bm25_topk,
    index_stats,
    multi_field_bm25_topk,
    open_index,
    restore_index,
    search,
    snapshot_index,
)
from igd_spark.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def docs(spark, tiny_docs):
    return assign_doc_ids(tiny_docs).cache()


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_multi_field_sums_per_field_bm25(spark, docs):
    from igd_spark.stats import term_stats
    from igd_spark.tokenizer import postings

    ts = term_stats(postings(docs)).filter((F.col("df") >= 15) & (F.col("df") <= 80))
    t = ts.orderBy("term").limit(1).collect()[0]["term"]
    role = docs.select("role").distinct().orderBy("role").limit(1).collect()[0]["role"]
    q = _queries(spark, [(0, f"{t} {role}")])
    fields = {"text": 1.0, "role": 3.0}
    out = multi_field_bm25_topk(docs, q, fields, k=2000, round_dp=9).toPandas()
    # brute force: per-field exact scorers with own stats, boosted sum
    want = {}
    for fcol, boost in fields.items():
        one_field = docs.select("doc_id", F.col(fcol).alias("text"))
        part = exact_bm25_topk(one_field, q, k=10**6).toPandas()
        for r in part.itertuples():
            want[r.doc_id] = want.get(r.doc_id, 0.0) + boost * r.score
    got = {r.doc_id: r.score for r in out.itertuples()}
    assert set(got) == set(want)
    for d, s in got.items():
        assert s == pytest.approx(round(want[d], 9), abs=2e-9)
    with pytest.raises(ValueError):
        multi_field_bm25_topk(docs, q, {})


def test_index_stats_and_snapshot_restore(spark, docs, tmp_path):
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    path = str(tmp_path / "idx")
    idx = build_index(spark, docs, path, conf=conf)
    st = index_stats(idx).collect()[0]
    assert st["n_docs"] == docs.count()
    # n_postings = distinct (doc, term) pairs; sum_dl = token occurrences
    assert st["n_postings"] <= st["sum_dl"]
    from igd_spark.tokenizer import postings

    assert st["n_postings"] == postings(docs).count()
    assert st["n_terms"] == idx.dictionary.count()
    assert st["n_blocks"] > 0 and st["n_batches"] == 0
    assert st["n_deleted_docs"] == 0 and st["n_delete_batches"] == 0

    from igd_spark.stats import term_stats

    t = (
        term_stats(postings(docs)).filter(F.col("df") >= 20)
        .orderBy("term").limit(1).collect()[0]["term"]
    )
    q = _queries(spark, [(0, t)])
    pre = search(spark, idx, q, k=10, engine="spark").toPandas()
    assert len(pre) == 10

    snap = str(tmp_path / "snap")
    snapshot_index(path, snap)
    with pytest.raises(FileExistsError):
        snapshot_index(path, snap)

    # mutate the ORIGINAL: delete its entire top-10
    dead = spark.createDataFrame(
        pd.DataFrame({"doc_id": pre["doc_id"].tolist()})
    )
    idx2 = delete_docs(spark, path, dead, delete_tag="snap_t")
    st2 = index_stats(idx2).collect()[0]
    # docs.deleted semantics: the DOC count, not the batch count
    assert st2["n_deleted_docs"] == len(pre["doc_id"].unique())
    assert st2["n_delete_batches"] == 1
    post = search(spark, idx2, q, k=10, engine="spark").toPandas()
    assert not set(pre["doc_id"]) & set(post["doc_id"])

    # the snapshot is untouched; restore yields the pre-delete results
    rest = restore_index(spark, snap, str(tmp_path / "restored"))
    got = search(spark, rest, q, k=10, engine="spark").toPandas()
    a = pre.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["doc_id"].equals(b["doc_id"])
    assert (abs(a["score"] - b["score"]) < 1e-12).all()
    # restored index is independent: deleting there leaves the snapshot dir alone
    delete_docs(spark, str(tmp_path / "restored"), dead, delete_tag="r_t")
    assert open_index(spark, snap).tombstone_tags == []


def test_rollover_lifecycle(spark, docs, tmp_path):
    from igd_spark import (
        append_index,
        open_alias,
        resolve_alias,
        rollover_index,
        search_federated,
        set_alias,
    )

    conf = IndexConf(block_size=32, n_shards=4)
    root = str(tmp_path / "aliases")
    gen1 = str(tmp_path / "logs-000001")
    half1 = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    half2 = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    build_index(spark, half1, gen1, conf=conf)
    set_alias(root, "logs-write", gen1)

    # conditions not met → no-op, alias unchanged
    r = rollover_index(spark, root, "logs-write", max_docs=10**9)
    assert not r["rolled"] and resolve_alias(root, "logs-write") == gen1

    # dry_run reports would_roll without creating anything
    r = rollover_index(spark, root, "logs-write", max_docs=1, dry_run=True)
    assert r["would_roll"] and not r["rolled"]
    assert resolve_alias(root, "logs-write") == gen1
    import os as _os

    assert not _os.path.exists(str(tmp_path / "logs-000002"))

    # real rollover: generation increments, alias swaps, old gen readable
    r = rollover_index(spark, root, "logs-write", max_docs=1)
    assert r["rolled"] and r["new_target"].endswith("logs-000002")
    assert resolve_alias(root, "logs-write") == r["new_target"]
    assert open_index(spark, gen1).meta["corpus"]["n_docs"] > 0

    # the write path continues through the alias into the empty generation
    append_index(spark, resolve_alias(root, "logs-write"), half2)
    q = _queries(spark, [(0, "error timeout"), (1, "deploy")])
    fed = search_federated(
        spark,
        [open_index(spark, gen1), open_alias(spark, root, "logs-write")],
        q, k=8, round_dp=6,
    ).collect()
    from igd_spark.querylang import _maybe_round
    from igd_spark.search import bm25_scores, rank_topk

    exact = rank_topk(
        _maybe_round(bm25_scores(docs, q, conf=conf), 6), 8
    ).collect()
    assert sorted(map(tuple, fed)) == sorted(map(tuple, exact))

    # condition validation
    with pytest.raises(ValueError):
        rollover_index(spark, root, "logs-write")


def test_reindex_subset_stats_and_transform(spark, docs, tmp_path):
    """reindex == build_index over the selection (same ranks+scores, i.e.
    SUBSET statistics); the source stays serveable; transform applies and
    must preserve doc_id."""
    from igd_spark import reindex

    conf = IndexConf(block_size=32, n_shards=4, salt_df_threshold=64)
    q = _queries(spark, [(0, "error timeout"), (1, "deploy")])

    # filter path: identical to building over the filtered frame
    a_idx = reindex(spark, docs, str(tmp_path / "re1"), where="role = 'user'",
                    conf=conf)
    b_idx = build_index(spark, docs.filter("role = 'user'"),
                        str(tmp_path / "b1"), conf=conf)
    a = [(r.query_id, r.rank, r.doc_id, round(r.score, 9))
         for r in search(spark, a_idx, q, k=5).collect()]
    b = [(r.query_id, r.rank, r.doc_id, round(r.score, 9))
         for r in search(spark, b_idx, q, k=5).collect()]
    assert sorted(a) == sorted(b) and a
    # subset stats differ from the full corpus (df/N changed) — the reindex
    # semantics, not a filtered match set
    full_idx = build_index(spark, docs, str(tmp_path / "full"), conf=conf)
    full = {(r.query_id, r.doc_id): round(r.score, 9)
            for r in search(spark, full_idx, q, k=10_000).collect()}
    assert any(full.get((qid, d)) not in (None, s) for qid, _rk, d, s in a)

    # transform path: drop a column is fine, dropping doc_id raises
    t_idx = reindex(spark, docs, str(tmp_path / "re2"),
                    transform=lambda d: d.drop("tool"), conf=conf)
    assert search(spark, t_idx, q, k=5).count() > 0
    with pytest.raises(ValueError):
        reindex(spark, docs, str(tmp_path / "re3"),
                transform=lambda d: d.drop("doc_id"), conf=conf)
