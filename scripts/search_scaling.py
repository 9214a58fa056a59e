"""Search-stage N→4N scaling evidence: query throughput on a PRE-BUILT
index, fresh JVM per level, interleaved reps (best taken), identical input
at both parallelism levels. Separates the query engine's scaling from
build-time noise — the full-suite version lives in scaling_bench.py.

Usage: python scripts/search_scaling.py [N] [reps]
Worker mode (internal): python scripts/search_scaling.py --worker <cores> <idx_path>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# per-rep wall time must exceed the VM's CPU-steal burst windows (tens of
# seconds) or single reps land anywhere in a 2-5x noise band — default to a
# batch big enough for ≥30s at the fast level
N_QUERIES = int(os.environ.get("IGD_SEARCH_SCALE_QUERIES", "5000"))
CONVS = int(os.environ.get("IGD_BENCH_CONVS", "50000"))


def worker(cores: int, idx_path: str) -> None:
    from bench import make_query_set
    from igd_spark.index import open_index
    from igd_spark.search import search
    from igd_spark.session import get_spark

    spark = get_spark(cores=cores, app=f"search_scale_{cores}", shuffle_partitions=64)
    idx = open_index(spark, idx_path)
    big = spark.createDataFrame(
        make_query_set(N_QUERIES), "query_id long, query_text string"
    )
    search(spark, idx, big, k=10).count()  # warm: plan + dictionary fold
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        search(spark, idx, big, k=10).count()
        runs.append(time.perf_counter() - t0)
    print(json.dumps({"cores": cores, "runs": runs, "qps": N_QUERIES / min(runs)}))


def ensure_index(idx_path: str) -> None:
    if os.path.exists(os.path.join(idx_path, "_meta.json")):
        return
    from bench import materialize_corpus
    from igd_spark import IndexConf, build_index
    from igd_spark.corpus import assign_doc_ids
    from igd_spark.session import get_spark

    spark = get_spark(cores=8, app="search_scale_build", shuffle_partitions=64)
    corpus, n = materialize_corpus(spark, 0.1)
    docs = spark.read.parquet(corpus)
    conf = IndexConf(block_size=128, n_shards=32, salt_df_threshold=65_536)
    build_index(
        spark, assign_doc_ids(docs, IndexConf(doc_id_method="hash")), idx_path, conf=conf
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n4 = 4 * n
    idx_path = f"/tmp/igd_search_scale_idx_c{CONVS}/idx"
    os.environ.setdefault("IGD_BENCH_CONVS", str(CONVS))
    ensure_index(idx_path)

    def run(cores: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), idx_path],
            capture_output=True, text=True, timeout=1800,
            env=dict(os.environ, IGD_BENCH_CONVS=str(CONVS)),
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-3000:])
            raise RuntimeError(f"worker failed at cores={cores}")
        return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])

    best = {n: 0.0, n4: 0.0}
    for i in range(reps):
        for cores in (n, n4):
            r = run(cores)
            best[cores] = max(best[cores], r["qps"])
            print(f"rep={i} cores={cores} qps={r['qps']:.1f}", file=sys.stderr)
    eff = (best[n4] / best[n]) / 4
    print(json.dumps({
        "metric": "search_scaling_efficiency",
        "n": n, "n4": n4,
        "qps_n": round(best[n], 1), "qps_4n": round(best[n4], 1),
        "efficiency": round(eff, 3),
        "n_queries": N_QUERIES, "convs": CONVS,
    }))


if __name__ == "__main__":
    main()
