"""Persisted embedding/ANN index: build → probe rank-identity vs the
in-memory operators, reopen-from-disk identity, existing-guard, and the
partition-pruning plan assertion (the whole point of persisting)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from igd_spark import (
    build_embedding_index,
    ivf_ann_topk,
    ivf_ann_topk_indexed,
    lsh_ann_topk,
    lsh_ann_topk_indexed,
    open_embedding_index,
    pick_anchors,
)

N_VEC, DIM = 300, 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    V = rng.randn(N_VEC, DIM).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(N_VEC, dtype=np.int64),
                        "embedding": [list(map(float, v)) for v in V]})
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()


@pytest.fixture(scope="module")
def eidx(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("embidx") / "eidx")
    return build_embedding_index(spark, emb, path, n_anchors=8)


def _rows(df):
    return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]


def test_lsh_indexed_rank_identical(spark, emb, queries, eidx):
    anchors = pick_anchors(emb, 8)
    assert eidx.anchors == [[float(x) for x in a] for a in anchors]
    mem = lsh_ann_topk(emb, queries, anchors, k=10)
    idx = lsh_ann_topk_indexed(spark, eidx, queries, k=10)
    assert _rows(mem) == _rows(idx)


def test_ivf_indexed_rank_identical(spark, emb, queries, eidx):
    anchors = pick_anchors(emb, 8)
    for nprobe in (1, 2):
        mem = ivf_ann_topk(emb, queries, anchors, k=10, nprobe=nprobe)
        idx = ivf_ann_topk_indexed(spark, eidx, queries, k=10, nprobe=nprobe)
        assert _rows(mem) == _rows(idx), f"nprobe={nprobe}"


def test_reopen_identical(spark, queries, eidx):
    re = open_embedding_index(spark, eidx.path)
    assert re.anchors == eidx.anchors and re.n_vectors == N_VEC and re.dim == DIM
    a = ivf_ann_topk_indexed(spark, eidx, queries, k=10)
    b = ivf_ann_topk_indexed(spark, re, queries, k=10)
    assert _rows(a) == _rows(b)


def test_existing_guard(spark, emb, eidx):
    with pytest.raises(FileExistsError):
        build_embedding_index(spark, emb, eidx.path)


def test_probe_scan_partition_pruned(spark, eidx):
    """The probe must read only the probed cell partitions: the scan node
    carries a PartitionFilters entry on `cell`, and the pruned read plans
    strictly fewer partitions than the full table."""
    scan = eidx.ivf.filter(F.col("cell").isin([0, 1]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    n_cells = eidx.ivf.select("cell").distinct().count()
    assert n_cells > 2  # the assertion below is vacuous otherwise
    pruned = {r["cell"] for r in scan.select("cell").distinct().collect()}
    assert pruned <= {0, 1}


def test_cell_counts_cover_corpus(spark, eidx):
    cc = eidx.cell_counts().collect()
    for layout in ("ivf", "lsh"):
        assert sum(r["n_vectors"] for r in cc if r["layout"] == layout) == N_VEC


def test_empty_and_oov_queries(spark, eidx):
    empty = spark.createDataFrame([], "query_id long, query_vec array<float>")
    assert lsh_ann_topk_indexed(spark, eidx, empty).count() == 0
    assert ivf_ann_topk_indexed(spark, eidx, empty).count() == 0


def test_filtered_knn_prefilter_semantics(spark, emb, queries, eidx):
    """Filtered kNN (the ES knn `filter` contract): every result satisfies
    the predicate, k results still come back when the allowed subset is
    large enough (pre-filter, not post-filter), and the filtered indexed
    probes equal the filtered in-memory operators."""
    from igd_spark import cosine_topk

    allowed = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    allowed_ids = {r["vec_id"] for r in allowed.collect()}

    top = cosine_topk(emb, queries, k=10, allowed=allowed)
    rows = top.collect()
    assert rows and all(r["vec_id"] in allowed_ids for r in rows)
    # pre-filter: full k per query (allowed subset ≫ k)
    assert top.groupBy("query_id").count().agg(F.min("count")).collect()[0][0] == 10
    # equals brute force over the restricted corpus
    sub = cosine_topk(emb.join(allowed, "vec_id", "left_semi"), queries, k=10)
    assert _rows(top) == _rows(sub)

    anchors = pick_anchors(emb, 8)
    for mem_fn, idx_fn, kw in (
        (lsh_ann_topk, lsh_ann_topk_indexed, {}),
        (ivf_ann_topk, ivf_ann_topk_indexed, {"nprobe": 2}),
    ):
        mem = mem_fn(emb, queries, anchors, k=10, allowed=allowed, **kw)
        idxr = idx_fn(spark, eidx, queries, k=10, allowed=allowed, **kw)
        assert _rows(mem) == _rows(idxr)
        assert all(r["vec_id"] in allowed_ids for r in idxr.collect())


def test_append_equals_full_build(spark, emb, queries, tmp_path_factory):
    """append_embedding_index with frozen anchors: probes over base ∪
    batch equal a fresh full build at the same anchors, for BOTH layouts;
    a replayed batch tag is a no-op; dim mismatch is refused."""
    from igd_spark import append_embedding_index, open_embedding_index

    anchors = pick_anchors(emb, 8)
    root = tmp_path_factory.mktemp("embapp")
    full = build_embedding_index(spark, emb, str(root / "full"), anchors=anchors)
    half_path = str(root / "half")
    build_embedding_index(
        spark, emb.filter(F.col("vec_id") % 2 == 0), half_path, anchors=anchors
    )
    appended = append_embedding_index(
        spark, half_path, emb.filter(F.col("vec_id") % 2 == 1), batch_tag="b1"
    )
    assert appended.n_vectors == full.n_vectors
    for fn in (ivf_ann_topk_indexed, lsh_ann_topk_indexed):
        a = _rows(fn(spark, full, queries, k=7))
        b = _rows(fn(spark, appended, queries, k=7))
        assert a == b and len(a) > 0, fn.__name__
    # idempotent replay: same tag, nothing changes
    replay = append_embedding_index(
        spark, half_path, emb.filter(F.col("vec_id") % 2 == 1), batch_tag="b1"
    )
    assert replay.n_vectors == full.n_vectors
    # dim guard
    bad = emb.limit(3).select(
        "vec_id", F.slice("embedding", 1, 4).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        append_embedding_index(spark, half_path, bad, batch_tag="b2")
    # compact folds the batch and preserves results
    from igd_spark import compact_embedding_index

    compacted = compact_embedding_index(spark, half_path)
    assert not compacted.batches and compacted.n_vectors == full.n_vectors
    for fn in (ivf_ann_topk_indexed, lsh_ann_topk_indexed):
        a = _rows(fn(spark, full, queries, k=7))
        b = _rows(fn(spark, compacted, queries, k=7))
        assert a == b, fn.__name__
    # reopen sees the compacted state identically
    reopened = open_embedding_index(spark, half_path)
    assert reopened.n_vectors == full.n_vectors


# ---------------------------------------------------------------------------
# int8 scalar-quantized probe layout (ivf_q8)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qeidx(spark, emb, tmp_path_factory):
    from igd_spark.embindex import build_quantized_layout

    path = str(tmp_path_factory.mktemp("qembidx") / "eidx")
    idx = build_embedding_index(spark, emb, path, n_anchors=8)
    build_quantized_layout(spark, idx)
    return idx


def test_quantized_oversample_limit_is_exact(spark, queries, qeidx):
    """oversample past the cell size ⇒ the shortlist is the whole cell and
    the rescore reproduces the exact IVF probe bit-for-bit."""
    from igd_spark.embindex import ivf_ann_topk_quantized

    exact = ivf_ann_topk_indexed(spark, qeidx, queries, k=10)
    quant = ivf_ann_topk_quantized(spark, qeidx, queries, k=10, oversample=10_000)
    assert _rows(exact) == _rows(quant)


def test_quantized_rescore_scores_are_exact(spark, queries, qeidx):
    """Every returned cos is the FULL-precision cosine (stage 2 rescores):
    any (query, vec) the quantized probe returns must carry the same score
    the exact probe assigns that pair."""
    from igd_spark.embindex import ivf_ann_topk_quantized

    exact = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in ivf_ann_topk_indexed(spark, qeidx, queries, k=100).collect()
    }
    for r in ivf_ann_topk_quantized(spark, qeidx, queries, k=10,
                                    oversample=3).collect():
        assert exact[(r["query_id"], r["vec_id"])] == r["cos"]


def test_quantized_refuses_without_layout(spark, emb, queries, tmp_path):
    from igd_spark.embindex import ivf_ann_topk_quantized

    idx = build_embedding_index(spark, emb, str(tmp_path / "noq"), n_anchors=8)
    with pytest.raises(ValueError, match="quantized"):
        ivf_ann_topk_quantized(spark, idx, queries, k=5)


def test_quantized_exact_across_uncovered_append(spark, emb, queries, tmp_path):
    """An append batch committed AFTER build_quantized_layout is served by
    live quantization — results equal a rebuilt layout's."""
    from igd_spark import append_embedding_index
    from igd_spark.embindex import build_quantized_layout, ivf_ann_topk_quantized

    path = str(tmp_path / "appq")
    half = emb.filter(F.col("vec_id") < N_VEC // 2)
    rest = emb.filter(F.col("vec_id") >= N_VEC // 2)
    idx = build_embedding_index(spark, half, path, n_anchors=8)
    build_quantized_layout(spark, idx)
    idx2 = append_embedding_index(spark, path, rest, batch_tag="t1")

    stale = _rows(ivf_ann_topk_quantized(spark, idx2, queries, k=10, oversample=3))
    build_quantized_layout(spark, idx2)  # re-cover: replaces ivf_q8 wholesale
    fresh = _rows(ivf_ann_topk_quantized(spark, idx2, queries, k=10, oversample=3))
    assert stale == fresh


def test_quantized_marker_discipline(spark, emb, queries, tmp_path):
    import json

    from igd_spark.embindex import build_quantized_layout, ivf_ann_topk_quantized

    path = str(tmp_path / "crashq")
    idx = build_embedding_index(spark, emb, path, n_anchors=8)
    build_quantized_layout(spark, idx)
    os.remove(os.path.join(path, "_quant.json"))
    with pytest.raises(ValueError, match="quantized"):
        ivf_ann_topk_quantized(spark, idx, queries, k=5)
