"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints exactly ONE JSON line to stdout.

Covers the graft's two authoritative metrics (BASELINE.json): index-build
throughput (turns/sec) and BM25 query throughput (qps, top-10) over a
deterministic synthetic transcript corpus sized to the scale factor, plus
the training-data pipeline headliners over the driver's documents/embeddings
tables. Used by scripts/scaling_bench.py at two parallelism levels for the
N→4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 500k convs/sf → sf0.1 ≈ 50k convs ≈ 400k turns (FIXTURES.md bench scale)
CONVS_PER_SF = 500_000
N_BENCH_QUERIES = 100


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_query_set(n: int = N_BENCH_QUERIES, seed: int = 42, n_terms: int = 10_000):
    """FIXTURES.md §2 mix: ~60% mid-frequency, 20% hot, 10% rare, 10% with an
    OOV term; 1-5 terms per query."""
    rng = np.random.default_rng(seed)
    out = []
    for qid in range(n):
        k = int(rng.integers(1, 6))
        r = rng.random()
        if r < 0.6:
            ids = rng.integers(50, 2000, size=k)
        elif r < 0.8:
            ids = rng.integers(0, 50, size=k)
        elif r < 0.9:
            ids = rng.integers(9000, n_terms, size=k)
        else:
            ids = rng.integers(50, 2000, size=k)
        terms = [f"t{int(i):05d}" for i in ids]
        if r >= 0.9:
            terms[0] = "zzoovterm"
        if qid % 10 == 0:
            terms[-1] = ["error", "timeout", "deploy"][qid % 3]
        out.append((qid, " ".join(terms)))
    return out


def bench_corpus_path(sf: float) -> str:
    return os.path.join(tempfile.gettempdir(), f"igd_bench_corpus_sf{sf}")


def materialize_corpus(spark, sf: float) -> tuple[str, int]:
    """Deterministic transcript corpus written once per sf to a temp parquet
    (reused across parallelism levels so scaling runs see identical input)."""
    from igd_spark.corpus import synth_transcripts_distributed

    path = bench_corpus_path(sf)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        n_convs = max(int(CONVS_PER_SF * sf), 200)
        log(f"materializing corpus: {n_convs} convs → {path}")
        # partitions pinned (NOT a function of CPUS): the per-partition seed
        # scheme means the partition count determines content; scaling runs
        # at different parallelism must read byte-identical input
        df = synth_transcripts_distributed(spark, n_convs=n_convs, seed=42, partitions=64)
        df.write.mode("overwrite").parquet(path)
    spark_df = spark.read.parquet(path)
    return path, spark_df.count()


def main() -> None:
    t_all = time.perf_counter()
    from pyspark.sql import functions as F

    from igd_spark import IndexConf, build_index, search
    from igd_spark.session import get_spark

    sf = _sf_from_dir(SF_DIR)
    spark = get_spark(cores=CPUS, app=f"igd_bench_sf{sf}", shuffle_partitions=max(CPUS, 16))
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- transcript corpus (not timed: fixture materialization) -------------
    corpus_path, n_turns = materialize_corpus(spark, sf)
    docs = spark.read.parquet(corpus_path)
    conf = IndexConf(block_size=128, n_shards=max(CPUS, 16), salt_df_threshold=65_536)

    # --- index build (turns/sec) --------------------------------------------
    from igd_spark.corpus import assign_doc_ids

    idx_path = tempfile.mkdtemp(prefix="igd_bench_idx_") + "/idx"
    t0 = time.perf_counter()
    with_ids = assign_doc_ids(docs, IndexConf(doc_id_method="hash"))
    idx = build_index(spark, with_ids, idx_path, conf=conf)
    timings["index_build"] = time.perf_counter() - t0
    extra["build_turns_per_sec"] = n_turns / timings["index_build"]
    log(f"built index over {n_turns} turns in {timings['index_build']:.1f}s")

    # --- BM25 search, reference query set (qps) -----------------------------
    # one warm-up pass (plan compilation, dictionary cache fill), one timed
    # steady-state pass — throughput is the steady-state number
    queries = spark.createDataFrame(make_query_set(), "query_id long, query_text string")
    search(spark, idx, queries, k=10).count()
    t0 = time.perf_counter()
    n_res = search(spark, idx, queries, k=10).count()
    timings["bm25_search_100q"] = time.perf_counter() - t0
    extra["search_qps"] = N_BENCH_QUERIES / timings["bm25_search_100q"]
    log(f"searched {N_BENCH_QUERIES} queries → {n_res} rows in {timings['bm25_search_100q']:.1f}s")

    # --- driver-table headliners --------------------------------------------
    import __spark_entry__ as em

    for name in (
        "bm25_topk",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "text_stats",
        "lang_id",
        "embedding_cosine_topk",
        "simhash_sketch",
    ):
        fn = em.queries()[name]
        t0 = time.perf_counter()
        cnt = fn(spark, SF_DIR).count()
        timings[name] = time.perf_counter() - t0
        log(f"{name}: {cnt} rows in {timings[name]:.2f}s")

    # --- arrow GEMM ANN over embeddings --------------------------------------
    from igd_spark import cosine_topk_arrow

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qrows = emb.orderBy("vec_id").limit(16).collect()
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    t0 = time.perf_counter()
    cosine_topk_arrow(spark, emb, qmat, qids, k=10).count()
    timings["embedding_topk_arrow"] = time.perf_counter() - t0

    shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)

    total = time.perf_counter() - t_all
    out = {
        "metric": "suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": CPUS,
        "n_turns": n_turns,
        "build_turns_per_sec": round(extra["build_turns_per_sec"], 1),
        "search_qps": round(extra["search_qps"], 2),
        "wall_secs": round(total, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
