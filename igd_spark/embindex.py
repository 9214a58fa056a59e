"""Persisted embedding / ANN index — the `.igd` discipline applied to the
embedding table.

The in-memory ANN operators (similarity.py: lsh_ann_topk / ivf_ann_topk)
recompute the bucket/cell assignment over the FULL embedding table on every
call — correct, but a full scan per query batch. The reference's entire
reason for the persisted `.igd` artifact (src/igd_base.c:396-461) is that a
query should PRUNE a prebuilt layout instead of rescanning; the inverted
index side already mirrors that (index.py). This module gives embeddings the
same treatment:

    build (once)              probe (every query batch)
    ---------------------     ---------------------------------------
    assign cell/bucket        derive the query's cells/buckets (tiny)
    write partitioned by it   partition-pruned scan of ONLY those dirs
    store vnorm               broadcast-join queries, GEMM-free rescore

On-disk layout (Parquet; 1:1 with an Iceberg table partitioned the same
way — the sandbox has no Iceberg runtime, see index.py's header for the
mapping discipline):

    <path>/_meta.json   anchors (verbatim), n_vectors, dim, schema version
                        (the 12-byte header analog, src/igd_base.c:408-410)
    <path>/ivf/         (vec_id, ev array<double>, vnorm) partitioned by
                        cell = argmin-L2 anchor (ivf_bucket_col) — the
                        inverted-file coarse quantizer; a probe touches
                        nprobe/|anchors| of the data
    <path>/lsh/         the same rows partitioned by
                        bucket = packed sign bits (lsh_bucket_col) — a
                        probe touches 1/2^n_anchors of the data

Rank identity with the in-memory variants is by construction, not by luck:
the stored `ev` is the SAME float64 cast (_dvec) both paths apply, `vnorm`
is norm_col evaluated once at build (doubles round-trip parquet exactly),
and the cell/bucket columns use the very expressions the in-memory
operators use — so the pruned scan sees exactly the rows the in-memory
join would keep, and the rounded-cosine tie-break is identical.

At 100 TB: cells/buckets are the partition spec, so Spark's partition
pruning (visible as PartitionFilters in the scan node) bounds IO before any
row is read; the broadcast query side never shuffles the corpus; file
sizing inside a hot cell is the writer's repartition(cell) — one shuffle at
build, zero at probe.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from igd_spark.similarity import (
    _dvec,
    dot_col,
    ivf_bucket_col,
    ivf_probe_cells,
    lsh_bucket_col,
    norm_col,
    pick_anchors,
)

EMB_SCHEMA_VERSION = 1


def _emb_batches_root(path: str) -> str:
    return os.path.join(path, "batches")


def _emb_list_batches(path: str) -> list[str]:
    root = _emb_batches_root(path)
    if not os.path.isdir(root):
        return []
    return sorted(
        t for t in os.listdir(root)
        if os.path.isdir(os.path.join(root, t))
    )


class EmbeddingIndex:
    """Open handle over a persisted embedding index (A3-analog: cheap,
    metadata-only; the data tables are lazy reads).

    Like the inverted-index handle, this is a SNAPSHOT over the base
    tables plus the append batches committed at open time; the table
    properties union base ∪ batches per layout, and partition pruning
    pushes into every branch (Catalyst pushes filters through Union)."""

    def __init__(
        self, spark: SparkSession, path: str, meta: dict,
        batches: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.meta = meta
        self.batches: list[str] = list(batches) if batches is not None else []
        self.anchors: list[list[float]] = [
            [float(x) for x in a] for a in meta["anchors"]
        ]

    def _union_read(self, sub: str) -> DataFrame:
        out = self.spark.read.parquet(os.path.join(self.path, sub))
        for tag in self.batches:
            out = out.unionByName(
                self.spark.read.parquet(
                    os.path.join(_emb_batches_root(self.path), tag, sub)
                )
            )
        return out

    @property
    def ivf(self) -> DataFrame:
        return self._union_read("ivf")

    @property
    def lsh(self) -> DataFrame:
        return self._union_read("lsh")

    @property
    def n_vectors(self) -> int:
        return int(self.meta["n_vectors"])

    @property
    def dim(self) -> int:
        return int(self.meta["dim"])

    def cell_counts(self) -> DataFrame:
        """(layout, part, n_vectors) — per-partition occupancy, the
        introspection surface (A7 analog: IGDr's per-bin counts,
        IGDr/R/IGDr.R:86-159). Reads parquet footers + partition dirs only."""
        ivf = self.ivf.groupBy(F.col("cell").alias("part")).agg(
            F.count("*").cast("long").alias("n_vectors")
        ).select(F.lit("ivf").alias("layout"), "part", "n_vectors")
        lsh = self.lsh.groupBy(F.col("bucket").alias("part")).agg(
            F.count("*").cast("long").alias("n_vectors")
        ).select(F.lit("lsh").alias("layout"), "part", "n_vectors")
        return ivf.unionByName(lsh)


def build_embedding_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    anchors: list[list[float]] | None = None,
    n_anchors: int = 8,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
) -> EmbeddingIndex:
    """Build + persist both ANN layouts in ONE corpus pass each.

    The build is two partitioned writes over a shared float64 projection:
    `repartition(cell)` / `repartition(bucket)` ahead of `partitionBy` keeps
    one writer task per partition value (no small-file explosion from every
    task writing every cell), which is also the one-and-only shuffle per
    layout. Anchors are frozen verbatim into _meta.json — a probe against a
    different anchor set is a different index, exactly like a different
    tokenizer is a different inverted index."""
    if os.path.exists(os.path.join(path, "_meta.json")):
        # existing-db guard (B9 analog, src/igd_create.c:480-482)
        raise FileExistsError(f"embedding index already exists at {path}")
    if anchors is None:
        anchors = pick_anchors(emb, n_anchors, emb_id=emb_id, emb_col=emb_col)
    anchors = [[float(x) for x in a] for a in anchors]

    base = emb.select(
        F.col(emb_id).alias("vec_id"), _dvec(emb_col).alias("ev")
    ).withColumn("vnorm", norm_col(F.col("ev")))

    ivf_rows = base.withColumn("cell", ivf_bucket_col(F.col("ev"), anchors))
    ivf_rows.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(path, "ivf"))

    lsh_rows = base.withColumn("bucket", lsh_bucket_col(F.col("ev"), anchors))
    lsh_rows.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(path, "lsh"))

    first = emb.select(F.size(F.col(emb_col)).alias("d")).first()
    meta = {
        "schema_version": EMB_SCHEMA_VERSION,
        "anchors": anchors,
        "n_vectors": spark.read.parquet(os.path.join(path, "ivf")).count(),
        "dim": int(first["d"]) if first is not None else 0,
    }
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return EmbeddingIndex(spark, path, meta)


def open_embedding_index(spark: SparkSession, path: str) -> EmbeddingIndex:
    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    if int(meta.get("schema_version", -1)) > EMB_SCHEMA_VERSION:
        raise ValueError(
            f"embedding index at {path} has schema_version "
            f"{meta['schema_version']} > reader {EMB_SCHEMA_VERSION}"
        )
    # fold committed append batches into n_vectors (additive, like the
    # inverted index's corpus-stats fold)
    batches = _emb_list_batches(path)
    n = int(meta["n_vectors"])
    for tag in batches:
        with open(
            os.path.join(_emb_batches_root(path), tag, "delta.json")
        ) as f:
            n += int(json.load(f)["n_vectors"])
    meta = {**meta, "n_vectors": n}
    return EmbeddingIndex(spark, path, meta, batches=batches)


def append_embedding_index(
    spark: SparkSession,
    path: str,
    emb: DataFrame,
    batch_tag: str | None = None,
    emb_id: str = "vec_id",
    emb_col: str = "embedding",
) -> EmbeddingIndex:
    """Append vectors to a persisted embedding index — the FAISS/Lucene
    add-to-existing-IVF contract: new vectors are assigned to cells and
    buckets with the FROZEN build-time anchors (re-clustering would be a
    different index; the Lucene analog is that appends never change the
    analyzer), so probe results over the union equal a fresh build over
    the union at the same anchors (pytest- and gate-enforced).

    COMMIT PROTOCOL: identical to append_index — the batch's two layout
    tables plus delta.json are written under _staging/<tag>/, then ONE
    os.rename publishes batches/<tag>/.  The batch dir is data, commit
    record, and idempotency marker at once; base tables are never
    rewritten; open handles keep their snapshot.  vec_ids must be new
    (disjoint from the existing index).

    At 10^12-turn scale this is the living-RAG maintenance path: daily
    embedding deltas land as batches, probes union-prune base + batches,
    and compact_embedding_index folds them back when the batch list
    grows."""
    idx = open_embedding_index(spark, path)
    if batch_tag is None:
        batch_tag = "append_" + os.urandom(8).hex()
    final = os.path.join(_emb_batches_root(path), batch_tag)
    if os.path.isdir(final):  # replayed tag: committed batch is a no-op
        return idx
    first = emb.select(F.size(F.col(emb_col)).alias("d")).first()
    dim = int(first["d"]) if first is not None else 0
    if idx.meta.get("dim") and dim and dim != int(idx.meta["dim"]):
        raise ValueError(
            f"append dim {dim} != index dim {idx.meta['dim']} at {path}"
        )
    staging = os.path.join(path, "_staging", batch_tag)
    base = emb.select(
        F.col(emb_id).alias("vec_id"), _dvec(emb_col).alias("ev")
    ).withColumn("vnorm", norm_col(F.col("ev")))
    ivf_rows = base.withColumn("cell", ivf_bucket_col(F.col("ev"), idx.anchors))
    ivf_rows.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(staging, "ivf"))
    lsh_rows = base.withColumn("bucket", lsh_bucket_col(F.col("ev"), idx.anchors))
    lsh_rows.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(staging, "lsh"))
    n_new = spark.read.parquet(os.path.join(staging, "ivf")).count()
    with open(os.path.join(staging, "delta.json"), "w") as f:
        json.dump({"n_vectors": int(n_new)}, f)
    os.makedirs(_emb_batches_root(path), exist_ok=True)
    os.rename(staging, final)  # the single atomic publish
    return open_embedding_index(spark, path)


def compact_embedding_index(spark: SparkSession, path: str) -> EmbeddingIndex:
    """Fold committed append batches back into the base layout tables (one
    repartitioned write per layout — same cost shape as a build over the
    union) and refresh _meta.json; restores single-scan-per-partition
    reads after many small appends."""
    import shutil

    idx = open_embedding_index(spark, path)
    if not idx.batches:
        return idx
    for sub, part in (("ivf", "cell"), ("lsh", "bucket")):
        tmp = os.path.join(path, f"{sub}_compacted")
        idx._union_read(sub).repartition(part).write.mode(
            "overwrite"
        ).partitionBy(part).parquet(tmp)
        old = os.path.join(path, f"{sub}_old")
        os.rename(os.path.join(path, sub), old)
        os.rename(tmp, os.path.join(path, sub))
        shutil.rmtree(old)
    meta = {**idx.meta, "n_vectors": int(idx.n_vectors)}
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    for tag in idx.batches:
        shutil.rmtree(os.path.join(_emb_batches_root(path), tag), ignore_errors=True)
    if not _emb_list_batches(path):
        shutil.rmtree(_emb_batches_root(path), ignore_errors=True)
    return open_embedding_index(spark, path)


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def lsh_ann_topk_indexed(
    spark: SparkSession,
    eidx: EmbeddingIndex,
    queries: DataFrame,
    k: int = 10,
    q_id: str = "query_id",
    q_col: str = "query_vec",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos) — lsh_ann_topk against the PERSISTED
    bucket-partitioned layout. Prologue: hash the (tiny) query set with the
    index's frozen anchors, collect the distinct buckets (ONE driver job on
    a query-sized frame — the same prune-set discipline as the inverted
    index's shard/term prologue, search.py), then scan ONLY those bucket
    partitions (PartitionFilters) and broadcast-join the queries. Rank- and
    score-identical to lsh_ann_topk(emb, queries, anchors) by construction.
    ``allowed`` (vec_id rows) pre-filters candidates AFTER partition
    pruning (filtered kNN: all k results satisfy the predicate; the
    semi-join touches only the pruned buckets' rows)."""
    q = queries.select(
        F.col(q_id).alias("query_id"), _dvec(q_col).alias("qv")
    ).withColumn("bucket", lsh_bucket_col(F.col("qv"), eidx.anchors))
    brows = q.select("bucket").distinct().collect()
    if not brows:
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cos double"
        )
    buckets = sorted(int(r["bucket"]) for r in brows)
    scan = eidx.lsh.filter(F.col("bucket").isin(buckets))
    if allowed is not None:
        scan = scan.join(allowed.select("vec_id"), "vec_id", "left_semi")
    j = scan.join(F.broadcast(q), "bucket")
    cos = dot_col(F.col("qv"), F.col("ev")) / (norm_col(F.col("qv")) * F.col("vnorm"))
    return _ranked_topk(
        j.select("query_id", "vec_id", F.round(cos, 6).alias("cos")), k
    )


def ivf_ann_topk_indexed(
    spark: SparkSession,
    eidx: EmbeddingIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    q_id: str = "query_id",
    q_col: str = "query_vec",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cos) — ivf_ann_topk against the PERSISTED
    cell-partitioned inverted file. The probe set is each query's nprobe
    nearest cells (ivf_probe_cells, identical scoring/tie-break to the
    build-time quantizer); the scan reads ONLY those cell partitions.
    nprobe stays the recall knob: IO grows as nprobe/|anchors| of the
    corpus, never a full scan. Rank- and score-identical to
    ivf_ann_topk(emb, queries, anchors, nprobe) by construction.
    ``allowed`` (vec_id rows) pre-filters candidates AFTER partition
    pruning (filtered kNN; the semi-join touches only the pruned cells)."""
    probe = ivf_probe_cells(queries, eidx.anchors, nprobe, q_id=q_id, q_col=q_col)
    crows = probe.select("cell").distinct().collect()
    if not crows:
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cos double"
        )
    cells = sorted(int(r["cell"]) for r in crows)
    scan = eidx.ivf.filter(F.col("cell").isin(cells))
    if allowed is not None:
        scan = scan.join(allowed.select("vec_id"), "vec_id", "left_semi")
    j = scan.join(F.broadcast(probe), "cell")
    cos = dot_col(F.col("qv"), F.col("ev")) / (norm_col(F.col("qv")) * F.col("vnorm"))
    return _ranked_topk(
        j.select("query_id", "vec_id", F.round(cos, 6).alias("cos")), k
    )


# ---------------------------------------------------------------------------
# Scalar-quantized (int8) probe layout — the ES 8.x quantized-kNN shape:
# candidate generation over a 4x-smaller int8 sibling table, exact rescore
# of the shortlist against the full-precision vectors.
# ---------------------------------------------------------------------------


def _q8_cols(ev: F.Column) -> tuple[F.Column, F.Column]:
    """(qscale, q8) per-vector scalar quantization: qscale = max |x_i|,
    q8_i = floor(127 * x_i / qscale + 0.5) — the explicit half-up floor is
    used (not round()) so Spark, DuckDB, and numpy produce bit-identical
    codes; qscale = 0 (the all-zero vector) quantizes to all zeros."""
    qscale = F.array_max(F.transform(ev, lambda x: F.abs(x)))
    safe = F.when(qscale == 0.0, F.lit(1.0)).otherwise(qscale)
    q8 = F.transform(
        ev, lambda x: F.floor(F.lit(127.0) * x / safe + F.lit(0.5)).cast("tinyint")
    )
    return qscale, q8


def build_quantized_layout(spark: SparkSession, eidx: EmbeddingIndex) -> None:
    """Materialize <path>/ivf_q8/: (vec_id, q8 array<tinyint>, qscale,
    vnorm) partitioned by cell — the same partition spec as ivf/, so the
    probe's cell pruning applies unchanged while each candidate row is
    ~4x smaller (int8 codes vs float64 components).  Derived purely from
    the persisted ivf/ rows, so rebuilding after appends/compaction is
    one cell-pruned scan.  Covered batch tags are recorded; a probe
    live-quantizes uncovered append batches (delta-sized) so results stay
    exact between rebuilds — the kgram/append discipline."""
    import shutil

    out = os.path.join(eidx.path, "ivf_q8")
    marker = os.path.join(eidx.path, "_quant.json")
    if os.path.exists(marker):
        os.remove(marker)  # marker-last commit (see kgram.py)
    qscale, q8 = _q8_cols(F.col("ev"))
    rows = eidx.ivf.select(
        "vec_id", "cell", "vnorm", qscale.alias("qscale"), q8.alias("q8")
    )
    # write-then-swap (compact_embedding_index's discipline): never
    # overwrite in place — concurrent probes hold the old file listing,
    # and a crashed rebuild must not leave a half-written live dir
    tmp = out + "_tmp"
    rows.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(tmp)
    if os.path.isdir(out):
        old = out + "_old"
        os.rename(out, old)
        os.rename(tmp, out)
        shutil.rmtree(old)
    else:
        os.rename(tmp, out)
    spark.catalog.refreshByPath(out)
    with open(marker, "w") as f:
        json.dump({"covered_batches": sorted(eidx.batches)}, f, indent=1)


def _quant_meta(path: str) -> dict | None:
    p = os.path.join(path, "_quant.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def ivf_ann_topk_quantized(
    spark: SparkSession,
    eidx: EmbeddingIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    oversample: int = 3,
    q_id: str = "query_id",
    q_col: str = "query_vec",
) -> DataFrame:
    """(query_id, rank, vec_id, cos) — two-stage quantized probe of the
    persisted inverted file:

      1. CANDIDATES: cell-pruned scan of ivf_q8/ (int8 codes — a quarter
         of the bytes of ivf/), approximate cosine
         (qscale/127) * dot(qv, q8) / (|qv| * vnorm), per-query top
         k*oversample shortlist (rounded 6 dp, vec_id tie-break: the cut
         is engine-deterministic).
      2. RESCORE: the shortlist joins back to the full-precision ivf/
         rows (same cell pruning, shortlist semi-join) and exact cosine
         re-ranks the final top-k.

    Recall is bounded by quantization error only at the shortlist edge —
    ``oversample`` is the knob (ES `num_candidates`).  At 100 TB stage 1
    reads nprobe/|anchors| of the int8 table and stage 2 touches
    queries x k x oversample rows: the full-precision table is never
    bulk-scanned."""
    meta = _quant_meta(eidx.path)
    if meta is None:
        raise ValueError(
            f"no quantized layout at {eidx.path}/ivf_q8 — run "
            f"build_quantized_layout first (or use ivf_ann_topk_indexed)"
        )
    probe = ivf_probe_cells(queries, eidx.anchors, nprobe, q_id=q_id, q_col=q_col)
    crows = probe.select("cell").distinct().collect()
    if not crows:
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cos double"
        )
    cells = sorted(int(r["cell"]) for r in crows)

    qtab = spark.read.parquet(os.path.join(eidx.path, "ivf_q8")).filter(
        F.col("cell").isin(cells)
    )
    stale = [
        t for t in eidx.batches if t not in set(meta.get("covered_batches", []))
    ]
    if stale:
        live = None
        for tag in stale:
            d = spark.read.parquet(
                os.path.join(_emb_batches_root(eidx.path), tag, "ivf")
            )
            live = d if live is None else live.unionByName(d)
        qscale, q8 = _q8_cols(F.col("ev"))
        qtab = qtab.unionByName(
            live.filter(F.col("cell").isin(cells)).select(
                "vec_id", "cell", "vnorm", qscale.alias("qscale"), q8.alias("q8")
            )
        )

    j = qtab.join(F.broadcast(probe), "cell")
    approx = (
        (F.col("qscale") / F.lit(127.0))
        * dot_col(F.col("qv"), F.col("q8"))
        / (norm_col(F.col("qv")) * F.col("vnorm"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("vec_id")
    )
    shortlist = (
        j.select("query_id", "vec_id", "cell", F.round(approx, 6).alias("approx"))
        .withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= k * oversample)
        .select("query_id", "vec_id", "cell")
    )

    full = eidx.ivf.filter(F.col("cell").isin(cells)).select(
        "vec_id", "ev", "vnorm"
    )
    rescored = shortlist.join(full, "vec_id").join(
        F.broadcast(probe.select("query_id", "qv").dropDuplicates(["query_id"])),
        "query_id",
    )
    cos = dot_col(F.col("qv"), F.col("ev")) / (
        norm_col(F.col("qv")) * F.col("vnorm")
    )
    return _ranked_topk(
        rescored.select("query_id", "vec_id", F.round(cos, 6).alias("cos")), k
    )
