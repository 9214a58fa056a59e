"""Incremental index maintenance: append_index and the Structured Streaming
ingest must produce an index whose BM25 top-k is rank-identical to a scorer
over the full corpus — including after avgdl shifts invalidate stored block
bounds (the safe-bound fallback path)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import IndexConf, build_index, exact_bm25_topk, open_index, search
from igd_spark.corpus import assign_doc_ids
from igd_spark.index import append_index

CONF = IndexConf(
    block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4, doc_id_method="hash"
)


def _queries(spark):
    qs = [(0, "error timeout"), (1, "t00000"), (2, "t00123 t00007 deploy"), (3, "t00001 t00002")]
    return spark.createDataFrame(pd.DataFrame(qs, columns=["query_id", "query_text"]))


def _topk_key(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()
    )


@pytest.fixture(scope="module")
def split_corpus(spark, tiny_docs):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    # deterministic half split by conversation
    first = docs.filter(F.crc32(F.col("conv_id")) % 2 == 0).cache()
    second = docs.filter(F.crc32(F.col("conv_id")) % 2 == 1).cache()
    assert first.count() > 0 and second.count() > 0
    return docs, first, second


def test_append_matches_full_rebuild(spark, split_corpus, tmp_path):
    docs, first, second = split_corpus
    path = str(tmp_path / "idx")
    build_index(spark, first, path, conf=CONF)
    idx = append_index(spark, path, second)
    queries = _queries(spark)
    got = _topk_key(search(spark, idx, queries, k=10))
    want = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    assert got == want
    # merged corpus stats are exact (integer-additive)
    assert idx.n_docs == docs.count()
    # reopen picks up the merged meta
    idx2 = open_index(spark, path)
    assert idx2.meta["appends"] == 1
    assert _topk_key(search(spark, idx2, queries, k=10)) == want


def test_stream_append_matches_full_rebuild(spark, split_corpus, tmp_path):
    docs, first, second = split_corpus
    path = str(tmp_path / "sidx")
    # base index on the first half; stream in the second half as file drops
    build_index(spark, first, path, conf=CONF)
    drops = str(tmp_path / "drops")
    second.drop("doc_id").repartition(3).write.parquet(drops)

    from igd_spark.streaming import stream_append, transcript_stream

    stream = transcript_stream(spark, drops, max_files_per_trigger=1)
    q = stream_append(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    idx = open_index(spark, path)
    assert idx.meta["appends"] >= 1

    queries = _queries(spark)
    got = _topk_key(search(spark, idx, queries, k=10))
    want = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    assert got == want


def test_compact_after_append(spark, split_corpus, tmp_path):
    from igd_spark import compact_index

    docs, first, second = split_corpus
    path = str(tmp_path / "cidx")
    build_index(spark, first, path, conf=CONF)
    append_index(spark, path, second)
    idx = compact_index(spark, path)
    queries = _queries(spark)
    got = _topk_key(search(spark, idx, queries, k=10))
    want = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    assert got == want
    # fragments merged: one block_id sequence per (term, salt), no dupes
    from pyspark.sql import functions as F

    dupes = (
        idx.segments.groupBy("term", "salt", "block_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0
    # every bound refreshed under the merged avgdl → tight pruning restored
    stale = idx.segments.filter(F.abs(F.col("b_avgdl") - idx.avgdl) > 1e-9).count()
    assert stale == 0
    assert idx.meta["compactions"] == 1 and idx.meta["appends"] == 0
    # doc ids strictly increasing within merged blocks
    import numpy as np

    from igd_spark import codec

    for r in idx.segments.limit(200).collect():
        d = codec.decode_doc_ids(bytes(r["doc_ids"]))
        assert (np.diff(d) > 0).all()


def test_append_rejects_dense_ids(spark, split_corpus, tmp_path):
    _, first, second = split_corpus
    dense_conf = IndexConf(block_size=32, n_shards=8, doc_id_method="dense")
    path = str(tmp_path / "didx")
    build_index(spark, first, path, conf=dense_conf)
    with pytest.raises(ValueError, match="append"):
        append_index(spark, path, second.drop("doc_id"), id_col=None)


def test_append_batch_tag_idempotent(spark, split_corpus, tmp_path):
    """Replaying an append with the same batch_tag (the Structured Streaming
    crash-replay case) must be a no-op: stats and top-k unchanged."""
    docs, first, second = split_corpus
    path = str(tmp_path / "iidx")
    build_index(spark, first, path, conf=CONF)
    idx1 = append_index(spark, path, second, batch_tag="b0001")
    n1, stats1 = idx1.n_docs, idx1.meta["corpus"]
    queries = _queries(spark)
    want = _topk_key(search(spark, idx1, queries, k=10))
    # replay
    idx2 = append_index(spark, path, second, batch_tag="b0001")
    assert idx2.n_docs == n1 and idx2.meta["corpus"] == stats1
    assert idx2.meta["appends"] == 1
    assert _topk_key(search(spark, idx2, queries, k=10)) == want


def test_compact_clears_applied_markers_for_tag_reuse(spark, split_corpus, tmp_path):
    """r4 (ADVICE): legacy applied_<tag> idempotency markers must not outlive
    the compaction that folds their data — a reused batch_tag after
    compaction must APPEND, not silently no-op."""
    from igd_spark import compact_index
    from igd_spark.index import _write_lineage

    docs, first, second = split_corpus
    path = str(tmp_path / "midx")
    build_index(spark, first, path, conf=CONF)
    # simulate a pre-upgrade (marker-after-data protocol) append marker
    _write_lineage(path, "applied_bX", {"rows": 0})
    idx = append_index(spark, path, second, batch_tag="bX")
    assert idx.n_docs == first.count()  # legacy marker honored: no-op
    compact_index(spark, path)
    assert not os.path.exists(os.path.join(path, "_lineage", "applied_bX.json"))
    idx = append_index(spark, path, second, batch_tag="bX")  # tag reuse
    assert idx.n_docs == docs.count()  # now appends


def test_compact_interleaved_with_appends_matches_rebuild(spark, split_corpus, tmp_path):
    """r4 ask #6: append → compact → append → compact must serve exactly the
    full-rebuild top-k at every step (the maintenance path under the same
    oracle discipline as the query paths)."""
    from igd_spark import compact_index

    docs, _, _ = split_corpus
    thirds = [docs.filter(F.crc32(F.col("conv_id")) % 3 == i) for i in range(3)]
    assert all(t.count() > 0 for t in thirds)
    queries = _queries(spark)
    path = str(tmp_path / "ivx")
    build_index(spark, thirds[0], path, conf=CONF)
    append_index(spark, path, thirds[1], batch_tag="iv1")
    idx = compact_index(spark, path)
    two = thirds[0].unionByName(thirds[1])
    assert _topk_key(search(spark, idx, queries, k=10)) == _topk_key(
        exact_bm25_topk(two, queries, k=10, conf=CONF)
    )
    idx = append_index(spark, path, thirds[2], batch_tag="iv2")
    want_all = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    assert _topk_key(search(spark, idx, queries, k=10)) == want_all
    idx = compact_index(spark, path)
    assert _topk_key(search(spark, idx, queries, k=10)) == want_all
    assert idx.meta["compactions"] == 2 and idx.meta["appends"] == 0


def test_maintain_index_policy(spark, split_corpus, tmp_path):
    """maintain_index: purges staging junk always, compacts only at the
    max_batches threshold, and search stays rank-identical throughout."""
    from igd_spark import maintain_index

    docs, first, second = split_corpus
    path = str(tmp_path / "mntidx")
    build_index(spark, first, path, conf=CONF)
    append_index(spark, path, second, batch_tag="mb1")
    # crashed-append leftovers
    os.makedirs(os.path.join(path, "_staging", "deadtag"), exist_ok=True)
    queries = _queries(spark)
    want = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    idx = maintain_index(spark, path, max_batches=2)  # below threshold
    assert not os.path.isdir(os.path.join(path, "_staging", "deadtag"))
    assert idx.meta["appends"] == 1  # no compaction yet
    assert _topk_key(search(spark, idx, queries, k=10)) == want
    idx = maintain_index(spark, path, max_batches=1)  # at threshold
    assert idx.meta["appends"] == 0 and idx.meta["compactions"] == 1
    assert _topk_key(search(spark, idx, queries, k=10)) == want


def test_fresh_stream_ignores_legacy_markers(spark, split_corpus, tmp_path):
    """r4 (ADVICE, medium): a NEW stream (fresh checkpoint, batch ids
    restarting at 0) attached to an index carrying legacy
    applied_stream_batch_<id> markers must still append its batches —
    the legacy no-op guard only applies to resumed checkpoints."""
    from igd_spark.index import _write_lineage, open_index
    from igd_spark.streaming import stream_append, transcript_stream

    docs, first, second = split_corpus
    path = str(tmp_path / "lgidx")
    build_index(spark, first, path, conf=CONF)
    # legacy markers from some earlier (pre-upgrade) stream's batches
    for i in range(8):
        _write_lineage(path, f"applied_stream_batch_{i}", {"rows": 0})
    drops = str(tmp_path / "lgdrops")
    second.drop("doc_id").repartition(3).write.parquet(drops)
    stream = transcript_stream(spark, drops, max_files_per_trigger=1)
    q = stream_append(stream, path, str(tmp_path / "lgckpt"))
    q.awaitTermination(120)
    idx = open_index(spark, path)
    assert idx.n_docs == docs.count()  # nothing silently dropped
    queries = _queries(spark)
    want = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    assert _topk_key(search(spark, idx, queries, k=10)) == want


def test_open_refuses_dirty_index(spark, split_corpus, tmp_path):
    """A crash mid-mutation leaves the in-progress marker; open_index must
    refuse (not silently serve half-merged tables) unless allow_dirty."""
    import json

    _, first, _ = split_corpus
    path = str(tmp_path / "dirty_idx")
    build_index(spark, first, path, conf=CONF)
    marker = os.path.join(path, "_lineage", "_inprogress.json")
    with open(marker, "w") as f:
        json.dump({"op": "append", "tag": "crashed"}, f)
    with pytest.raises(RuntimeError, match="unfinished"):
        open_index(spark, path)
    idx = open_index(spark, path, allow_dirty=True)
    assert idx.n_docs > 0
    os.remove(marker)
    open_index(spark, path)  # clean again


def test_dictionary_deltas_fold_and_compact(spark, split_corpus, tmp_path):
    """Appends drop dictionary DELTA rows (O(delta vocab), the stream-rate
    path); the logical view folds them; compact consolidates physically."""
    docs, first, second = split_corpus
    path = str(tmp_path / "ddict")
    build_index(spark, first, path, conf=CONF)
    idx = append_index(spark, path, second)
    # physical rows across base + committed batch dirs > logical terms
    # (delta rows present; the base dictionary is never rewritten)...
    import glob

    delta_dirs = glob.glob(os.path.join(path, "batches", "*", "dictionary"))
    assert delta_dirs, "append must commit a batch dir with a dictionary delta"
    raw = spark.read.parquet(os.path.join(path, "dictionary"), *delta_dirs)
    n_logical = idx.dictionary.count()
    assert raw.count() > n_logical
    # ...but the logical view folds df additively
    from igd_spark.tokenizer import postings

    want_df = {
        r["term"]: r["cnt"]
        for r in postings(docs, conf=CONF).groupBy("term").agg(
            F.count("*").alias("cnt")).collect()
    }
    got_df = {r["term"]: r["df"] for r in idx.dictionary.collect()}
    assert got_df == want_df
    from igd_spark import compact_index

    idx2 = compact_index(spark, path)
    raw2 = spark.read.parquet(os.path.join(path, "dictionary"))
    assert raw2.count() == idx2.dictionary.count() == n_logical
    assert {r["term"]: r["df"] for r in idx2.dictionary.collect()} == want_df


def test_append_commit_is_atomic_under_crash(spark, split_corpus, tmp_path, monkeypatch):
    """Kill the append at the worst moment — after every table is written
    but before the commit rename — and the live index must be byte-for-byte
    unaffected; replaying the same batch_tag must then apply EXACTLY once.
    (The pre-r3 marker-after-data protocol double-appended in this case.)"""
    import igd_spark.index as idxmod

    docs, first, second = split_corpus
    path = str(tmp_path / "aidx")
    build_index(spark, first, path, conf=CONF)
    queries = _queries(spark)
    before = _topk_key(search(spark, open_index(spark, path), queries, k=10))
    n_before = open_index(spark, path).n_docs

    real_rename = os.rename

    def crash_rename(src, dst):
        if "_staging" in src and "batches" in dst:
            raise OSError("injected crash before commit rename")
        return real_rename(src, dst)

    monkeypatch.setattr(idxmod.os, "rename", crash_rename)
    with pytest.raises(OSError, match="injected"):
        append_index(spark, path, second, batch_tag="crashed_batch")
    monkeypatch.setattr(idxmod.os, "rename", real_rename)

    # crash left the live index untouched: same stats, same results, opens clean
    idx = open_index(spark, path)
    assert idx.n_docs == n_before and idx.meta["appends"] == 0
    assert _topk_key(search(spark, idx, queries, k=10)) == before

    # replay with the SAME tag applies exactly once (staging junk is swept)
    idx = append_index(spark, path, second, batch_tag="crashed_batch")
    assert idx.n_docs == docs.count() and idx.meta["appends"] == 1
    want = _topk_key(exact_bm25_topk(docs, queries, k=10, conf=CONF))
    assert _topk_key(search(spark, idx, queries, k=10)) == want
    # a second replay after the successful commit is a no-op
    idx2 = append_index(spark, path, second, batch_tag="crashed_batch")
    assert idx2.n_docs == idx.n_docs and idx2.meta["appends"] == 1


def test_purge_staging_removes_only_dead_tags(tmp_path):
    """Crashed appends leave _staging/<tag> junk; purge_staging must remove
    dead tags, spare active ones, and be a no-op without a staging root."""
    import os

    from igd_spark.index import purge_staging

    path = str(tmp_path / "idx")
    os.makedirs(os.path.join(path, "_staging", "dead1", "segments"))
    os.makedirs(os.path.join(path, "_staging", "live1"))
    assert purge_staging(path, active_tags={"live1"}) == ["dead1"]
    assert os.path.isdir(os.path.join(path, "_staging", "live1"))
    assert not os.path.isdir(os.path.join(path, "_staging", "dead1"))
    assert purge_staging(path) == ["live1"]
    assert not os.path.isdir(os.path.join(path, "_staging"))
    assert purge_staging(path) == []
