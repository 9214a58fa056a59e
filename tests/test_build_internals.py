"""Build-path invariants: SPIMI tokenizer parity, salt-shard probe-set
mirror, block packing structure (SURVEY §5 invariants the reference implies:
Σtf per doc == dl; salted-shard union == unsalted; sorted blocks)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from igd_spark.build import shard_col, shards_for
from igd_spark.config import IndexConf
from igd_spark.corpus import assign_doc_ids
from igd_spark.tokenizer import postings, postings_spimi


def test_spimi_matches_jvm_postings(spark, tiny_docs):
    conf = IndexConf()
    docs = assign_doc_ids(tiny_docs, conf)
    a = postings(docs, conf=conf)
    b = postings_spimi(docs, conf=conf)
    ka = {(r["doc_id"], r["term"]): r["tf"] for r in a.collect()}
    kb = {(r["doc_id"], r["term"]): r["tf"] for r in b.collect()}
    assert ka == kb


def test_spimi_dl_is_sum_tf(spark, tiny_docs):
    conf = IndexConf()
    docs = assign_doc_ids(tiny_docs, conf)
    p = postings_spimi(docs, conf=conf)
    bad = (
        p.groupBy("doc_id", "dl")
        .agg(F.sum("tf").alias("s"))
        .filter(F.col("s") != F.col("dl"))
        .count()
    )
    assert bad == 0


def test_shards_for_mirrors_shard_col(spark):
    n_shards = 7
    rows = [(int(t), int(s)) for t in (-13, -1, 0, 5, 123456789) for s in range(3)]
    df = spark.createDataFrame(rows, "term_id long, salt int").withColumn(
        "shard", shard_col(F.col("term_id"), F.col("salt"), n_shards)
    )
    for r in df.collect():
        probe = shards_for(r["term_id"], r["salt"] + 1, n_shards)
        assert r["shard"] in probe, (r, probe)
        # pmod semantics: non-negative
        assert 0 <= r["shard"] < n_shards


def test_blocks_sorted_and_sized(spark, tiny_docs, tmp_path):
    from igd_spark import build_index
    from igd_spark import codec

    conf = IndexConf(block_size=16, n_shards=4, salt_df_threshold=32, max_salts=4)
    docs = assign_doc_ids(tiny_docs, conf)
    idx = build_index(spark, docs, str(tmp_path / "idx"), conf=conf)
    seg = idx.segments.collect()
    assert len(seg) > 0
    by_list: dict = {}
    for r in seg:
        d = codec.decode_doc_ids(bytes(r["doc_ids"]))
        assert len(d) == r["n"] <= conf.block_size
        assert d[0] == r["first_doc"] and d[-1] == r["last_doc"]
        assert (np.diff(d) > 0).all()  # strictly increasing within block
        by_list.setdefault((r["term"], r["salt"]), []).append((r["block_id"], d))
    # blocks within a (term, salt) list are doc-ordered and non-overlapping
    for blocks in by_list.values():
        blocks.sort()
        for (_, d1), (_, d2) in zip(blocks, blocks[1:]):
            assert d1[-1] < d2[0]
    # salted union == unsalted postings set
    from igd_spark.tokenizer import postings as jvm_postings

    want = {
        (r["term"], r["doc_id"]) for r in jvm_postings(docs, conf=conf).collect()
    }
    got = set()
    for r in seg:
        for doc in codec.decode_doc_ids(bytes(r["doc_ids"])):
            got.add((r["term"], int(doc)))
    assert got == want
