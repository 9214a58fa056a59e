"""Block-max skipping inside the MaxScore kernel: deferred (hot) lists must
skip decoding blocks whose [first_doc, last_doc] range contains no surviving
candidate — and the skips must not change a single rank or score (the skip
is exactness-preserving by construction: a skipped block holds no survivor).
The kernel is invoked directly on collected block rows so the decode
counters are observable (Spark python workers are separate processes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import math

from igd_spark import IndexConf, build_index, exact_bm25_topk
from igd_spark.corpus import assign_doc_ids
from igd_spark.search import _maxscore_kernel, query_terms


def idf_py(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

CONF = IndexConf(block_size=8, n_shards=4, salt_df_threshold=64, max_salts=4)
K = 5


@pytest.fixture(scope="module")
def kernel_inputs(spark, tiny_docs, tmp_path_factory):
    docs = assign_doc_ids(tiny_docs, CONF).cache()
    path = str(tmp_path_factory.mktemp("bmx") / "idx")
    idx = build_index(spark, docs, path, conf=CONF)
    # one query mixing a rare probe term (essential bootstrap) with the
    # hottest Zipf term (big, low-idf list -> deferred)
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_text": ["error t00000"]})
    )
    qt = {r["term"] for r in query_terms(queries).collect()}
    drows = idx.dictionary.filter(idx.dictionary.term.isin(list(qt))).collect()
    term_ids = {r["term"]: int(r["term_id"]) for r in drows}
    dfs = {r["term"]: int(r["df"]) for r in drows}
    blocks = (
        idx.segments.filter(idx.segments.term_id.isin(list(term_ids.values())))
        .toPandas()
    )
    qpdf = pd.DataFrame(
        {
            "query_id": [0] * len(drows),
            "term_id": [term_ids[t] for t in sorted(term_ids)],
            "idf": [idf_py(idx.n_docs, dfs[t]) for t in sorted(term_ids)],
        }
    )
    return docs, idx, blocks, qpdf


def test_deferred_fold_skips_blocks_and_stays_exact(spark, kernel_inputs):
    docs, idx, blocks, qpdf = kernel_inputs
    stats: dict = {}
    kernel = _maxscore_kernel(K, 0, CONF.k1, CONF.b, idx.avgdl, stats=stats)
    out = kernel(blocks, qpdf)
    assert stats["blocks_skipped"] > 0, (
        f"hot-list fold decoded every block ({stats}) — block-max skipping "
        "is not engaging on the Zipf fixture"
    )
    assert stats["blocks_decoded"] < len(blocks)
    # exactness: identical ranks AND scores vs the index-free scorer
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_text": ["error t00000"]})
    )
    want = exact_bm25_topk(docs, queries, k=K, conf=CONF).collect()
    want_key = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in want]
    got = out.sort_values("rank")
    got_key = [
        (int(q), int(rk), int(d), round(float(s), 9))
        for q, rk, d, s in zip(got["query_id"], got["rank"], got["doc_id"], got["score"])
    ]
    assert got_key == want_key


def test_skip_never_engages_without_deferral(spark, kernel_inputs):
    """A pure rare-term query has no deferred lists — the skip path must not
    fire (and the kernel must still answer correctly)."""
    docs, idx, blocks, qpdf = kernel_inputs
    one = qpdf[qpdf["idf"] == qpdf["idf"].max()].reset_index(drop=True)
    stats: dict = {}
    kernel = _maxscore_kernel(K, 0, CONF.k1, CONF.b, idx.avgdl, stats=stats)
    out = kernel(blocks, one)
    assert len(out) > 0
    assert stats["blocks_skipped"] == 0


def test_essential_demotion_skips_and_stays_exact(spark, kernel_inputs):
    """Full-BMW essential side: with a rare high-idf anchor term raising θ0
    above the tail essential lists' suffix sum, the tail lists are demoted
    to refine-only and skip blocks holding no candidate — with zero change
    to ranks or scores."""
    docs, idx, _, _ = kernel_inputs
    qtext = "error t00005 t00006"
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_text": [qtext]})
    )
    qt = {r["term"] for r in query_terms(queries).collect()}
    drows = idx.dictionary.filter(idx.dictionary.term.isin(list(qt))).collect()
    term_ids = {r["term"]: int(r["term_id"]) for r in drows}
    dfs = {r["term"]: int(r["df"]) for r in drows}
    blocks = (
        idx.segments.filter(idx.segments.term_id.isin(list(term_ids.values())))
        .toPandas()
    )
    qpdf = pd.DataFrame(
        {
            "query_id": [0] * len(drows),
            "term_id": [term_ids[t] for t in sorted(term_ids)],
            "idf": [idf_py(idx.n_docs, dfs[t]) for t in sorted(term_ids)],
        }
    )
    stats: dict = {}
    kernel = _maxscore_kernel(K, 0, CONF.k1, CONF.b, idx.avgdl, stats=stats)
    out = kernel(blocks, qpdf)
    assert stats["blocks_skipped_essential"] > 0, (
        f"essential demotion never engaged ({stats}) on {qtext}"
    )
    want = exact_bm25_topk(docs, queries, k=K, conf=CONF).collect()
    want_key = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in want]
    got = out.sort_values("rank")
    got_key = [
        (int(q), int(rk), int(d), round(float(s), 9))
        for q, rk, d, s in zip(got["query_id"], got["rank"], got["doc_id"], got["score"])
    ]
    assert got_key == want_key
