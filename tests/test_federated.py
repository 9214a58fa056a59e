"""search_federated — ES cross-index search with exact (dfs) global
statistics: rank identity through any partitioning of the corpus into
member indexes, config-mismatch guard, per-member tombstones respected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from igd_spark import (
    IndexConf,
    build_index,
    delete_docs,
    open_index,
    search,
    search_federated,
)
from igd_spark.corpus import assign_doc_ids

CONF = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)


@pytest.fixture(scope="module")
def fed(spark, tiny_docs, tmp_path_factory):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    root = tmp_path_factory.mktemp("fed")
    whole = build_index(spark, docs, str(root / "whole"), conf=CONF)
    parts = []
    for m in range(3):
        part = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == m)
        parts.append(build_index(spark, part, str(root / f"p{m}"), conf=CONF))
    return str(root), docs, whole, parts


QUERIES = [(0, "error timeout"), (1, "the tool t00000"), (2, "zzznope")]


def _q(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def _key(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


def test_federation_rank_identity(spark, fed):
    _, _, whole, parts = fed
    want = _key(search(spark, whole, _q(spark), k=10, engine="spark"))
    got3 = _key(search_federated(spark, parts, _q(spark), k=10))
    assert got3 == want and len(want) > 0
    # 1-member federation degenerates to plain search
    got1 = _key(search_federated(spark, [whole], _q(spark), k=10))
    assert got1 == want


def test_federation_config_guard(spark, fed):
    root, docs, whole, parts = fed
    other = IndexConf(block_size=32, n_shards=8, k1=0.9)
    alt = build_index(
        spark, docs.limit(50), f"{root}/alt", conf=other
    )
    with pytest.raises(ValueError, match="disagree"):
        search_federated(spark, [whole, alt], _q(spark))
    with pytest.raises(ValueError, match="at least one"):
        search_federated(spark, [], _q(spark))


def test_federation_member_tombstones(spark, fed):
    """A delete committed in ONE member disappears from federated results;
    surviving docs' scores are unchanged (Lucene frozen-stats delete
    semantics carry through federation)."""
    root, _, whole, parts = fed
    before = _key(search_federated(spark, parts, _q(spark), k=10))
    # victims must LIVE in member 0 (doc_id % 3 == 0): a tombstone only
    # suppresses postings in the member that holds the document
    victims = [d for _, _, d, _ in before if d % 3 == 0][:2]
    assert victims, "some top hits live in member 0"
    delete_docs(
        spark,
        parts[0].path,
        spark.createDataFrame([(v,) for v in victims], "doc_id long"),
        delete_tag="fed_del",
    )
    # reopen member 0 so the new tombstone batch is in its snapshot
    reparts = [open_index(spark, parts[0].path)] + parts[1:]
    after = _key(search_federated(spark, reparts, _q(spark), k=20))
    hit_docs = {d for _, _, d, _ in after}
    assert not (hit_docs & set(victims))
    # survivors keep identical scores (stats frozen until expunge)
    before_scores = {d: s for _, _, d, s in before}
    for _, _, d, s in after:
        if d in before_scores:
            assert s == before_scores[d]
