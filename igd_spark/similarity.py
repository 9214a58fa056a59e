"""Embedding similarity search — brute-force cosine top-k, threshold
near-dup pairs, and a sign-LSH bucketed ANN scale path.

Structural kinship with the reference: IGD answers "which records overlap
this query region" by binning the axis and scanning only matching bins
(src/igd_search.c:454-534). ANN answers "which vectors are close to this
query" the same way: LSH buckets are the bins, and only same-bucket vectors
are scanned. The brute-force path is the exact oracle (like IGD's full tile
scan); the bucketed path is the 100 TB plan.

Two kernels for the dot product:
* `cosine_scores` — pure pyspark.sql (zip_with/aggregate), JVM codegen,
  oracle-checkable against DuckDB list_dot_product.
* `cosine_topk_arrow` — mapInPandas + numpy BLAS matmul against a broadcast
  query matrix: the actual hot path at scale (one GEMM per Arrow batch,
  no per-row work). Rank-identical to the SQL path by construction
  (float64 everywhere, same tie-break).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dvec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_scores(
    emb: DataFrame,
    queries: DataFrame,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
    q_id: str = "query_id",
    q_col: str = "query_vec",
) -> DataFrame:
    """(query_id, vec_id, cos) — all pairs query × corpus, cosine in float64,
    rounded to 6 dp (cross-engine float stability). Queries are broadcast —
    the corpus side streams, never shuffles."""
    q = queries.select(F.col(q_id).alias("query_id"), _dvec(q_col).alias("qv"))
    e = emb.select(F.col(emb_id).alias("vec_id"), _dvec(emb_col).alias("ev"))
    j = e.crossJoin(F.broadcast(q))
    cos = dot_col(F.col("qv"), F.col("ev")) / (norm_col(F.col("qv")) * norm_col(F.col("ev")))
    return j.select("query_id", "vec_id", F.round(cos, 6).alias("cos"))


def _apply_allowed(e: DataFrame, allowed: DataFrame | None) -> DataFrame:
    """Pre-filter for filtered vector search (the ES kNN ``filter``
    contract): restrict the CANDIDATE set before scoring and top-k, so all
    k results satisfy the predicate — post-filtering a top-k would return
    fewer than k.  ``allowed`` is a (vec_id) frame (any extra columns
    ignored); the semi-join keys on the fine-grained id, so at scale it
    shuffles the candidate set, never the full corpus (and under a
    partition-pruned probe, only the pruned scan's rows)."""
    if allowed is None:
        return e
    return e.join(allowed.select("vec_id"), "vec_id", "left_semi")


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    allowed: DataFrame | None = None,
    min_sim: float | None = None,
    **kw,
) -> DataFrame:
    """(query_id, rank, vec_id, cos) — brute-force exact top-k per query,
    tie-break (cos desc, vec_id asc) on the ROUNDED score so ranking is
    reproducible across engines.  ``allowed`` pre-filters candidates
    (filtered kNN; see `_apply_allowed`) — applied to the embedding side
    BEFORE scoring, so excluded vectors' cosines are never computed.
    ``min_sim`` is the ES knn ``similarity`` cutoff: candidates below the
    cosine floor are dropped BEFORE the ranking window (a query may
    return fewer than k rows), so "only results at least this close"
    never pads with junk neighbors."""
    if allowed is not None:
        emb_id = kw.get("emb_id", "vec_id")
        emb = emb.join(
            allowed.select(F.col("vec_id").alias(emb_id)), emb_id, "left_semi"
        )
    scored = cosine_scores(emb, queries, **kw)
    if min_sim is not None:
        scored = scored.filter(F.col("cos") >= F.lit(float(min_sim)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def vector_topk(
    emb: DataFrame,
    queries: DataFrame,
    metric: str = "l2",
    k: int = 10,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
    q_id: str = "query_id",
    q_col: str = "query_vec",
) -> DataFrame:
    """(query_id, rank, vec_id, score) — exact top-k under the non-cosine
    dense-vector metrics (the ES `dense_vector` ``similarity`` surface;
    cosine lives in `cosine_topk`):

    * ``l2`` — score = 1 / (1 + ‖q−e‖²), the l2_norm convention (higher
      is closer, bounded (0, 1]).  ‖q−e‖² is computed as
      ⟨q,q⟩ + ⟨e,e⟩ − 2⟨q,e⟩ (clamped at 0 against float residue) so the
      only array kernel is the same dot product the cosine path uses.
    * ``dot`` — score = (1 + ⟨q,e⟩) / 2, the dot_product convention
      (callers are expected to feed unit-normalized vectors; the formula
      is applied as-is either way).
    * ``mip`` — max_inner_product: ⟨q,e⟩ < 0 → 1/(1−⟨q,e⟩), else
      ⟨q,e⟩ + 1 — the piecewise map that keeps scores positive without
      requiring normalized vectors.

    All three are monotone in the underlying distance/product, so rank
    order equals the exact ANN order; scores are rounded to 6 dp and
    tie-broken (score desc, vec_id asc) on the rounded value for
    cross-engine reproducibility.

    Scale: identical shape to `cosine_topk` — queries broadcast, the
    corpus side streams through one narrow projection, per-query top-k
    via window.  The same scored column can ride the IVF/LSH probes
    (cell pruning is metric-agnostic for l2 on normalized vectors; for
    mip use the raw-dot ordering)."""
    q = queries.select(F.col(q_id).alias("query_id"), _dvec(q_col).alias("qv"))
    e = emb.select(F.col(emb_id).alias("vec_id"), _dvec(emb_col).alias("ev"))
    j = e.crossJoin(F.broadcast(q))
    dot = dot_col(F.col("qv"), F.col("ev"))
    if metric == "l2":
        qq = dot_col(F.col("qv"), F.col("qv"))
        ee = dot_col(F.col("ev"), F.col("ev"))
        d2 = F.greatest(qq + ee - F.lit(2.0) * dot, F.lit(0.0))
        score = F.lit(1.0) / (F.lit(1.0) + d2)
    elif metric == "dot":
        score = (F.lit(1.0) + dot) / F.lit(2.0)
    elif metric == "mip":
        score = F.when(dot < 0, F.lit(1.0) / (F.lit(1.0) - dot)).otherwise(
            dot + F.lit(1.0)
        )
    else:
        raise ValueError(f"unknown metric {metric!r} (l2 | dot | mip)")
    scored = j.select("query_id", "vec_id", F.round(score, 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
    exact: bool = True,
    anchors: list[list[float]] | None = None,
    n_bands: int = 4,
) -> DataFrame:
    """(vec_a, vec_b, cos) — cosine near-duplicates (vec_a < vec_b,
    cos ≥ threshold).

    Default exact=True: the all-pairs crossJoin with RECALL 1 — the
    semantics a dedup caller silently relies on, viable to ~10^4-10^5
    vectors. At scale pass exact=False: sign-LSH band candidates + exact
    cosine verification (cosine_neardup_banded) — candidate count is
    bucket-bounded, no cartesian product, but recall < 1 for pairs near
    the threshold (precision stays exact). With anchors=None the banding
    is sized from a count of emb per cosine_neardup_banded's own rule
    (band_bits ≈ log2(n) - 10, ≥ 2) — a fixed anchor count would be the
    degenerate ~n²/2^bits regime the docstring there warns about."""
    if not exact:
        if anchors is None:
            import math

            n = emb.count()
            band_bits = max(2, int(math.ceil(math.log2(max(n, 2)))) - 10)
            anchors = pick_anchors(
                emb, band_bits * n_bands, emb_id=emb_id, emb_col=emb_col
            )
            # corpora smaller than the anchor budget return fewer rows —
            # trim to a whole number of bands; under n_bands anchors,
            # shrink to 1-bit bands (max(...) kept MORE than a whole
            # number and crashed the divisibility check downstream)
            if len(anchors) < n_bands:
                n_bands = max(1, len(anchors))
            anchors = anchors[: (len(anchors) // n_bands) * n_bands]
            if not anchors:
                # 0-1 vector corpus: banding is meaningless and the exact
                # path is free at this size
                exact = True
        if not exact:
            return cosine_neardup_banded(
                emb, anchors, threshold=threshold, n_bands=n_bands,
                emb_id=emb_id, emb_col=emb_col,
            )
    e = emb.select(F.col(emb_id).alias("vid"), _dvec(emb_col).alias("v"))
    a = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"))
    j = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = dot_col(F.col("va"), F.col("vb")) / (norm_col(F.col("va")) * norm_col(F.col("vb")))
    return j.select("vec_a", "vec_b", F.round(cos, 6).alias("cos")).filter(
        F.col("cos") >= threshold
    )


def cosine_neardup_banded(
    emb: DataFrame,
    anchors: list[list[float]],
    threshold: float = 0.95,
    n_bands: int = 4,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos) — banded sign-LSH near-dup pairs: the anchors'
    sign bits are split into n_bands slices; any pair agreeing on ≥1 whole
    slice becomes a candidate, then exact cosine verifies ≥ threshold.
    Same "bin, then look only inside the bin" shape as IGD's tile pruning
    (src/igd_search.c:459-464); deterministic, so an oracle can mirror the
    banding exactly. Recall is probabilistic in general (more/shorter bands
    = higher recall); precision is exact (candidates are verified).

    SIZING: selectivity is 2^band_bits buckets per band, so band_bits must
    grow with log2(n) or buckets stay macroscopic and the verify step goes
    quadratic — at n=50k vectors, 2-bit bands (4 buckets) admit ~n²/16
    candidates. Rule of thumb: band_bits ≈ log2(n) - 10 (≥2), i.e. 16+
    anchors per 4 bands at n≈10^5, 40+ at n≈10^8."""
    n_anchors = len(anchors)
    if n_anchors % n_bands:
        raise ValueError("len(anchors) must be divisible by n_bands")
    band_bits = n_anchors // n_bands
    e = emb.select(F.col(emb_id).alias("vid"), _dvec(emb_col).alias("v"))
    band_vals = []
    for j in range(n_bands):
        val = F.lit(0)
        for i in range(band_bits):
            anc = anchors[j * band_bits + i]
            arr = F.array(*[F.lit(float(x)) for x in anc])
            val = val + F.when(dot_col(F.col("v"), arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        band_vals.append(val.cast("int"))
    bands = e.select(
        "vid", F.posexplode(F.array(*band_vals)).alias("band_id", "band_val")
    )
    a = bands.select(F.col("vid").alias("vec_a"), "band_id", "band_val")
    b = bands.select(F.col("vid").alias("vec_b"), "band_id", "band_val")
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"))
    vb = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"))
    j = cand.join(va, "vec_a").join(vb, "vec_b")
    cos = dot_col(F.col("va"), F.col("vb")) / (norm_col(F.col("va")) * norm_col(F.col("vb")))
    return j.select("vec_a", "vec_b", F.round(cos, 6).alias("cos")).filter(
        F.col("cos") >= threshold
    )


# ---------------------------------------------------------------------------
# Scale path: sign-LSH bucketed ANN
# ---------------------------------------------------------------------------


def lsh_bucket_col(vec: Column, anchors: list[list[float]]) -> Column:
    """Bucket id = bit_i = [dot(vec, anchor_i) >= 0], packed little-endian.
    Anchors are data-derived (deterministic), embedded as literals."""
    bits = []
    for i, anc in enumerate(anchors):
        arr = F.array(*[F.lit(float(x)) for x in anc])
        bits.append(F.when(dot_col(vec, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def pick_anchors(emb: DataFrame, n_anchors: int = 8, emb_id: str = "vec_id",
                 emb_col: str = "embedding") -> list[list[float]]:
    """First n_anchors vectors by id — deterministic, no RNG (sandbox-safe,
    and reproducible by any oracle)."""
    rows = emb.orderBy(emb_id).limit(n_anchors).select(emb_col).collect()
    return [[float(x) for x in r[emb_col]] for r in rows]


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    anchors: list[list[float]],
    k: int = 10,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
    q_id: str = "query_id",
    q_col: str = "query_vec",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos) — approximate top-k: score only corpus
    vectors in the query's LSH bucket. At 100 TB the corpus is written
    partitioned by bucket → the probe is a partition-pruned scan + broadcast
    join, touching 1/2^n_anchors of the data.  ``allowed`` (vec_id rows)
    pre-filters candidates (filtered kNN, `_apply_allowed`)."""
    e = emb.select(F.col(emb_id).alias("vec_id"), _dvec(emb_col).alias("ev")).withColumn(
        "bucket", lsh_bucket_col(F.col("ev"), anchors)
    )
    e = _apply_allowed(e, allowed)
    q = queries.select(F.col(q_id).alias("query_id"), _dvec(q_col).alias("qv")).withColumn(
        "bucket", lsh_bucket_col(F.col("qv"), anchors)
    )
    j = e.join(F.broadcast(q), "bucket")
    cos = dot_col(F.col("qv"), F.col("ev")) / (norm_col(F.col("qv")) * norm_col(F.col("ev")))
    scored = j.select("query_id", "vec_id", F.round(cos, 6).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def ivf_bucket_col(vec: Column, anchors: list[list[float]]) -> Column:
    """IVF coarse quantization: bucket = argmin over anchors of the L2
    distance (equivalently argmax of dot - |a|^2/2), ties broken by the
    smallest anchor id (array_position returns the FIRST max). Linear-size
    expression: a folded when/otherwise argmax duplicates subtrees
    exponentially and stalls Catalyst."""
    scores = []
    for anc in anchors:
        arr = F.array(*[F.lit(float(x)) for x in anc])
        half_norm = F.lit(float(sum(x * x for x in anc) / 2.0))
        scores.append(F.round(dot_col(vec, arr) - half_norm, 9))
    sarr = F.array(*scores)
    return (F.array_position(sarr, F.array_max(sarr)) - 1).cast("int")


def ivf_probe_cells(
    queries: DataFrame,
    anchors: list[list[float]],
    nprobe: int,
    q_id: str = "query_id",
    q_col: str = "query_vec",
) -> DataFrame:
    """(query_id, qv, cell) — each query's top-nprobe IVF cells by the same
    (dot - |a|²/2) score ivf_bucket_col ranks with (rounded to 9 dp, ties to
    the smaller anchor id). nprobe=1 reproduces ivf_bucket_col's assignment;
    nprobe>1 is the recall knob: probe the nprobe nearest cells."""
    q = queries.select(F.col(q_id).alias("query_id"), _dvec(q_col).alias("qv"))
    scores = []
    for anc in anchors:
        arr = F.array(*[F.lit(float(x)) for x in anc])
        half_norm = F.lit(float(sum(x * x for x in anc) / 2.0))
        scores.append(F.round(dot_col(F.col("qv"), arr) - half_norm, 9))
    exploded = q.select(
        "query_id", "qv", F.posexplode(F.array(*scores)).alias("cell", "cscore")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("cell"))
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cell").cast("int").alias("cell"))
    )


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    anchors: list[list[float]],
    k: int = 10,
    nprobe: int = 1,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
    q_id: str = "query_id",
    q_col: str = "query_vec",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos) — IVF-style approximate top-k: corpus
    vectors are coarse-quantized to their nearest anchor (inverted file);
    each query probes its nprobe nearest cells. At 100 TB the corpus is
    written partitioned by cell → partition-pruned scan, nprobe/|anchors|
    of the data; nprobe is the recall knob.  ``allowed`` (vec_id rows)
    pre-filters candidates (filtered kNN, `_apply_allowed`)."""
    e = emb.select(F.col(emb_id).alias("vec_id"), _dvec(emb_col).alias("ev")).withColumn(
        "cell", ivf_bucket_col(F.col("ev"), anchors)
    )
    e = _apply_allowed(e, allowed)
    q = ivf_probe_cells(queries, anchors, nprobe, q_id=q_id, q_col=q_col)
    j = e.join(F.broadcast(q), "cell")
    cos = dot_col(F.col("qv"), F.col("ev")) / (norm_col(F.col("qv")) * norm_col(F.col("ev")))
    scored = j.select("query_id", "vec_id", F.round(cos, 6).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


# ---------------------------------------------------------------------------
# Arrow/BLAS kernel — the physical hot path at scale
# ---------------------------------------------------------------------------

_TOPK_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ]
)


def cosine_topk_arrow(
    spark: SparkSession,
    emb: DataFrame,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via per-partition GEMM + partial top-k, then a tiny final
    top-k. Each Arrow batch does ONE float64 matmul (queries × batch), keeps
    its local top-k per query, so the shuffle carries ≤ k·n_queries rows per
    partition — the map-side partial aggregation discipline of the
    reference's hits[] accumulator (src/igd_search.c:491), applied to top-k.
    """
    qm = np.asarray(query_mat, dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qids = np.asarray(query_ids, dtype=np.int64)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            vids = pdf[emb_id].to_numpy(dtype=np.int64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = np.round(qn @ Vn.T, 6)  # (n_queries, batch)
            kk = min(k, S.shape[1])
            # partial top-k per query within the batch with an explicit
            # (cos desc, vec_id asc) tie-break: rows tied at the kk-th score
            # must resolve to the SMALLER vec_id or the batch-local cut can
            # drop a row the global top-k keeps
            qs, vs, ss = [], [], []
            for qi in range(S.shape[0]):
                row = S[qi]
                t = np.partition(row, -kk)[-kk]
                cand = np.flatnonzero(row >= t)
                order = cand[np.lexsort((vids[cand], -row[cand]))][:kk]
                qs.append(np.full(order.size, qids[qi], dtype=np.int64))
                vs.append(vids[order])
                ss.append(row[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qs),
                    "vec_id": np.concatenate(vs),
                    "cos": np.concatenate(ss),
                }
            )

    part = emb.select(emb_id, emb_col).mapInPandas(kernel, schema=_TOPK_PARTIAL_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
