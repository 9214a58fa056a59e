"""Transcript corpus: deterministic synthetic generator + docID assignment.

Fixture shape per FIXTURES.md §1 / BASELINE.json input_hint:
(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp). One document = one turn under stable (conv_id, turn_idx)
ordering — the analog of the reference's sorted-by-start tile invariant
(src/igd_base.c:424-459).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from igd_spark.config import DEFAULT_CONF, IndexConf

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_ROLES = ["user", "assistant", "tool"]
_TOOLS = [f"tool{i}" for i in range(10)]
_PROBES = ["error", "timeout", "deploy"]


def _vocab(n_terms: int = 10_000) -> list[str]:
    return [f"t{i:05d}" for i in range(n_terms)]


def synth_transcripts_pdf(
    n_convs: int = 2_000,
    seed: int = 42,
    n_terms: int = 10_000,
    zipf_s: float = 1.2,
    max_turns: int = 12,
    min_tokens: int = 5,
    max_tokens: int = 120,
) -> pd.DataFrame:
    """Seeded, fully reproducible pandas corpus (FIXTURES.md §1).

    Zipf-distributed vocabulary so hot-term skew is real; probe terms
    injected at deterministic positions for hand-checkable queries; a few
    empty texts (analog of s>=e records dropped at insert,
    src/igd_base.c:120 — here they tokenize to zero postings).
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(n_terms))
    # Zipf pmf over ranks 1..n_terms
    ranks = np.arange(1, n_terms + 1, dtype=np.float64)
    pmf = ranks ** (-zipf_s)
    pmf /= pmf.sum()

    rows: list[tuple] = []
    base_ts = pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None)
    for ci in range(n_convs):
        conv = f"conv{ci:08d}"
        n_turns = int(rng.integers(2, max_turns + 1))
        for ti in range(n_turns):
            role = _ROLES[ti % 3]
            if rng.random() < 0.01:
                text = ""  # empty turn: zero postings, still a document
            else:
                n_tok = int(rng.integers(min_tokens, max_tokens + 1))
                toks = vocab[rng.choice(n_terms, size=n_tok, p=pmf)]
                toks = toks.tolist()
                # deterministic probe injection
                if (ci + ti) % 17 == 0:
                    toks[ti % len(toks)] = _PROBES[(ci + ti) % 3]
                text = " ".join(toks)
            tool = None if rng.random() < 0.7 else _TOOLS[int(rng.integers(10))]
            ts = base_ts + pd.Timedelta(seconds=ci * 1000 + ti)
            rows.append((conv, ti, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def synth_transcripts(
    spark: SparkSession, n_convs: int = 2_000, seed: int = 42, **kw
) -> DataFrame:
    pdf = synth_transcripts_pdf(n_convs=n_convs, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def synth_transcripts_distributed(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    partitions: int = 32,
    **kw,
) -> DataFrame:
    """Bench-scale generator: each partition synthesizes a disjoint conv-id
    range with a derived seed — embarrassingly parallel, no driver bottleneck
    (this is how the 10^12-turn corpus would be materialized: a mapInPandas
    over a range, writing straight to the lake)."""
    per = (n_convs + partitions - 1) // partitions

    def gen(iter_pdf):
        for pdf in iter_pdf:
            for pid in pdf["pid"]:
                lo = int(pid) * per
                n = min(per, n_convs - lo)
                if n <= 0:
                    continue
                out = synth_transcripts_pdf(n_convs=n, seed=seed + int(pid), **kw)
                # shift conv ids into this partition's range
                out["conv_id"] = [
                    f"conv{lo + int(c[4:]):08d}" for c in out["conv_id"]
                ]
                yield out

    pids = spark.range(partitions).select(F.col("id").alias("pid")).repartition(partitions, "pid")
    return pids.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def read_transcripts(
    spark: SparkSession,
    paths: str | list[str],
    fmt: str = "parquet",
) -> DataFrame:
    """File-list / glob / directory batch source — the create_igd_f analog
    (src/igd_create.c:130-166: build from an explicit list of input files).
    Accepts a single path/glob or an explicit list of paths; the reader
    parallelizes across files and row groups, schema pinned to the
    transcript shape (extra columns are dropped, missing ones error)."""
    reader = spark.read.format(fmt)
    if fmt == "parquet":
        df = reader.load(paths if isinstance(paths, list) else [paths])
    else:
        df = reader.schema(TRANSCRIPT_SCHEMA).load(
            paths if isinstance(paths, list) else [paths]
        )
    return df.select([f.name for f in TRANSCRIPT_SCHEMA.fields])


def create_from_files(
    spark: SparkSession,
    paths: str | list[str],
    index_path: str,
    conf: IndexConf = DEFAULT_CONF,
    fmt: str = "parquet",
    resume: bool = False,
):
    """`igd create "<glob>" <out>` end-to-end: read the file list, assign
    doc ids per conf.doc_id_method, build the index."""
    from igd_spark.index import build_index

    docs = read_transcripts(spark, paths, fmt=fmt)
    return build_index(spark, docs, index_path, conf=conf, id_col=None, resume=resume)


def assign_doc_ids(
    docs: DataFrame, conf: IndexConf = DEFAULT_CONF
) -> DataFrame:
    """Stable docID under (conv_id, turn_idx) ordering → adds ``doc_id:long``.

    hash (default, the 10^12-turn path): doc_id = pmod(xxhash64(conv_id,
      turn_idx), 2^63) — stateless, shuffle-free, stable under any
      partitioning, append-safe. The FULL 63-bit positive space is used
      (no conv/turn bit split): expected birthday collisions are n²/2^64,
      i.e. ~5·10⁻⁴ at 10⁸ turns and a 5·10⁻⁸ *rate* at the 10^12-turn
      target — audited by audit_doc_ids(); a detected collision is
      remediated by re-keying the affected convs with a seed suffix or
      falling back to dense. Blocks delta-encode doc ids, so sparse ids
      cost only the first-gap varint per block.
    dense: exact global rank over (conv_id, turn_idx) — compact ids
      (tightest delta compression), via repartitionByRange + per-partition
      offsets: a distributed range sort, NOT a single-partition window.
      Not append-safe (each batch restarts at 0) — batch/test mode.
    """
    if conf.doc_id_method == "dense":
        return _assign_dense_ids(docs)
    if conf.doc_id_method != "hash":
        raise ValueError(conf.doc_id_method)
    return docs.withColumn(
        "doc_id",
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit((1 << 63) - 1)).cast("long"),
    )


def _assign_dense_ids(docs: DataFrame, n_parts: int | None = None) -> DataFrame:
    """doc_id = global 0-based rank under the total order (conv_id,
    turn_idx). Scalable dense assignment: range-repartition on the order
    key, sort within partitions, then add each partition's cumulative row
    offset to its local sequence — two jobs over the sorted data (count,
    emit), no global single-partition sort. Ids are deterministic because
    the order is total, regardless of where range boundaries land."""
    spark = docs.sparkSession
    if n_parts is None:
        n_parts = max(docs.rdd.getNumPartitions(), 1)
    ordered = (
        docs.repartitionByRange(n_parts, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        int(r["_pid"]): int(r["c"])
        for r in ordered.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in docs.schema.fields] + [T.StructField("doc_id", T.LongType(), False)]
    )
    cols = [f.name for f in docs.schema.fields]

    def emit(it):
        local = 0
        for pdf in it:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iat[0])]
            out = pdf[cols].copy()
            out["doc_id"] = np.arange(base + local, base + local + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield out

    result = ordered.mapInPandas(emit, schema=out_schema)
    # note: `ordered` stays persisted until the caller's action completes;
    # Spark evicts LRU — callers doing repeated builds can unpersist via
    # spark.catalog.clearCache()
    return result


def audit_doc_ids(docs_with_ids: DataFrame) -> int:
    """Collision audit for the hash path: returns number of duplicate doc_ids
    (must be 0). Distributed groupBy — no collect of the id space."""
    dup = (
        docs_with_ids.groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
        .collect()[0]["n"]
    )
    return int(dup)


def docid_roundtrip_check(docs_with_ids: DataFrame) -> int:
    """Per-turn text-equality invariant (BASELINE.json input_hint): joining the
    doc_id map back to the source by (conv_id, turn_idx) must reproduce text
    byte-identically. Returns mismatch count (must be 0)."""
    src = docs_with_ids.select("conv_id", "turn_idx", "text")
    via = docs_with_ids.select("conv_id", "turn_idx", "doc_id", F.col("text").alias("t2"))
    j = src.join(via, ["conv_id", "turn_idx"])
    bad = j.filter(
        ~(F.col("text").eqNullSafe(F.col("t2")))
    ).count()
    return int(bad)
