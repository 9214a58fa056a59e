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
from pyspark.sql import DataFrame, SparkSession, Window
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


def assign_doc_ids(
    docs: DataFrame, conf: IndexConf = DEFAULT_CONF
) -> DataFrame:
    """Stable docID under (conv_id, turn_idx) ordering → adds ``doc_id:long``.

    dense: row_number over a global order — exact, rank-friendly, but a
      single-partition window sort: correct at test scale, NOT the 10^12 path.
    hash: composite (xxhash64(conv_id) << turn_bits | turn_idx) — stateless,
      no global sort, stable under any partitioning; collisions audited by
      audit_doc_ids(). This is the scale path (SURVEY §7.3c).
    """
    if conf.doc_id_method == "dense":
        w = Window.orderBy("conv_id", "turn_idx")
        return docs.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    mask = (1 << conf.turn_bits) - 1
    if conf.doc_id_method != "hash":
        raise ValueError(conf.doc_id_method)
    conv_part = F.shiftleft(
        F.pmod(F.xxhash64("conv_id"), F.lit(1 << (62 - conf.turn_bits))), conf.turn_bits
    )
    return docs.withColumn(
        "doc_id",
        (conv_part + F.col("turn_idx").cast("long").bitwiseAND(F.lit(mask).cast("long"))).cast("long"),
    )


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
