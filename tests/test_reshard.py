"""reshard_index — the ES shrink/split analog: shard-count change as ONE
shuffle of the packed block table (shard is derived from (term_id, salt),
build.shard_col), never a corpus re-ingest — vs the reference, where a bin
geometry change (-b, src/igd_create.c:454-457) forces full re-insert because
records are duplicated per tile (src/igd_base.c:162-172).

Invariants proven here: rank identity (BM25 + phrase) at both smaller and
larger shard counts, block payloads moved bit-identically, append batches
folded, tombstones carried, guards on dest/n_shards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    delete_docs,
    index_stats,
    open_index,
    reshard_index,
    search,
)
from igd_spark.corpus import assign_doc_ids
from igd_spark.search import phrase_match_indexed


@pytest.fixture(scope="module")
def src(spark, tiny_docs, tmp_path_factory):
    conf = IndexConf(
        block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4,
        store_positions=True,
    )
    docs = assign_doc_ids(tiny_docs, conf).cache()
    root = tmp_path_factory.mktemp("reshard")
    path = str(root / "idx")
    build_index(spark, docs, path, conf=conf)
    # exercise the union fold: an append batch + a tombstone batch must both
    # survive the reshard
    from igd_spark import append_index

    extra = spark.createDataFrame(
        [(10_000 + i, f"appended retry timeout doc t{i:05d}") for i in range(20)],
        "doc_id long, text string",
    )
    append_index(spark, path, extra, batch_tag="rs_batch")
    victims = [int(r["doc_id"]) for r in docs.limit(3).select("doc_id").collect()]
    delete_docs(
        spark,
        path,
        spark.createDataFrame([(v,) for v in victims], "doc_id long"),
        delete_tag="rs_del",
    )
    return str(root), path, open_index(spark, path), victims


QUERIES = [(0, "error timeout"), (1, "retry failed connection"), (2, "appended retry")]


def _ranked(spark, idx, k=10):
    q = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in search(spark, idx, q, k=k).collect()
    )


def _phrases(spark, idx):
    p = spark.createDataFrame(
        [(0, "error timeout"), (1, "the tool")], "query_id long, query_text string"
    )
    return sorted(
        (r["query_id"], r["doc_id"], r["n_hits"])
        for r in phrase_match_indexed(spark, idx, p).collect()
    )


@pytest.mark.parametrize("new_n", [3, 32])
def test_rank_identity_both_directions(spark, src, new_n):
    root, path, idx, _ = src
    dest = os.path.join(root, f"resharded_{new_n}")
    if not os.path.exists(os.path.join(dest, "_meta.json")):
        reshard_index(spark, path, dest, n_shards=new_n)
    ridx = open_index(spark, dest)
    assert ridx.n_shards() == new_n
    assert _ranked(spark, ridx) == _ranked(spark, idx)
    assert _phrases(spark, ridx) == _phrases(spark, idx)


def test_blocks_move_wholesale(spark, src):
    """Every (term_id, salt, block_id) payload is byte-identical — the
    reshard touched WHERE a block lives, never WHAT it holds."""
    root, path, idx, _ = src
    dest = os.path.join(root, "resharded_3")
    if not os.path.exists(os.path.join(dest, "_meta.json")):
        reshard_index(spark, path, dest, n_shards=3)
    ridx = open_index(spark, dest)

    def blocks(i):
        return sorted(
            (
                r["term_id"], r["salt"], r["block_id"], r["n"],
                bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["dls"]),
            )
            for r in i.segments.select(
                "term_id", "salt", "block_id", "n", "doc_ids", "tfs", "dls"
            ).collect()
        )

    assert blocks(ridx) == blocks(idx)
    # every new shard value obeys the derived formula under the new count
    bad = ridx.segments.filter(
        F.col("shard")
        != F.pmod(F.pmod(F.col("term_id"), F.lit(3)) + F.col("salt"), F.lit(3))
    ).count()
    assert bad == 0


def test_tombstones_and_stats_carried(spark, src):
    root, path, idx, victims = src
    dest = os.path.join(root, "resharded_32")
    if not os.path.exists(os.path.join(dest, "_meta.json")):
        reshard_index(spark, path, dest, n_shards=32)
    ridx = open_index(spark, dest)
    hit_docs = {d for _, _, d, _ in _ranked(spark, ridx, k=50)}
    assert not (hit_docs & set(victims))
    s0 = index_stats(idx).collect()[0]
    s1 = index_stats(ridx).collect()[0]
    for col in ("n_docs", "avgdl", "sum_dl", "n_terms", "n_postings", "n_blocks",
                "n_deleted_docs"):
        assert s1[col] == s0[col], col
    assert s1["n_batches"] == 0  # appends folded into the new base


def test_guards(spark, src):
    root, path, _, _ = src
    with pytest.raises(ValueError):
        reshard_index(spark, path, os.path.join(root, "x"), n_shards=0)
    dest = os.path.join(root, "resharded_3")
    if os.path.exists(os.path.join(dest, "_meta.json")):
        with pytest.raises(FileExistsError):
            reshard_index(spark, path, dest, n_shards=3)


def test_alias_swap_publishes_reshard(spark, src):
    """The reshard→alias-swap lifecycle: serve through an alias, reshard to
    a new path, swap; handles opened before the swap keep their snapshot,
    handles after see the new shard count — same results either way."""
    from igd_spark import open_alias, reshard_index, resolve_alias, set_alias

    root, path, idx, _ = src
    arow = os.path.join(root, "aliases")
    set_alias(arow, "serving", path)
    before = open_alias(spark, arow, "serving")
    assert before.n_shards() == 8 and resolve_alias(arow, "serving").endswith("idx")
    dest = os.path.join(root, "resharded_6")
    reshard_index(spark, path, dest, n_shards=6)
    set_alias(arow, "serving", dest)  # atomic swap
    after = open_alias(spark, arow, "serving")
    assert after.n_shards() == 6
    assert before.n_shards() == 8  # pre-swap handle keeps its snapshot
    assert _ranked(spark, after) == _ranked(spark, before)


def test_alias_refuses_dangling_target(src):
    from igd_spark import set_alias

    root, _, _, _ = src
    with pytest.raises(FileNotFoundError):
        set_alias(os.path.join(root, "aliases"), "bad", os.path.join(root, "nope"))
