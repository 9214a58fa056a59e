"""spark-submit job — the engine driven exactly as the north rule ships it:
`spark-submit --master local[N] --py-files igd_spark.zip submit_job.py`.

The script imports igd_spark ONLY from the --py-files zip (it asserts the
import resolved inside the zip, not a repo checkout on PYTHONPATH), builds
an index over the deterministic synthetic transcript corpus, runs a BM25
query batch, and prints one JSON line:

    {"cores": N, "turns": T, "build_tps": ..., "qps": ..., "from_zip": true}

Driven by scripts/submit_bench.py at two parallelism levels for the
N -> 4N scaling-efficiency evidence (BASELINE.md "Sandbox scaling
protocol"). On a real cluster the same command line with
`--master yarn`/`k8s://...` is the production entry point — nothing in
the package reads local repo state.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    import igd_spark

    pkg_path = os.path.dirname(os.path.abspath(igd_spark.__file__))
    from_zip = ".zip" in pkg_path or pkg_path.endswith(".zip")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from igd_spark import IndexConf, build_index, search
    from igd_spark.corpus import assign_doc_ids, synth_transcripts_distributed

    spark = SparkSession.builder.getOrCreate()
    cores = spark.sparkContext.defaultParallelism

    n_convs = int(os.environ.get("IGD_SUBMIT_CONVS", "20000"))
    # partitions pinned so N and 4N read byte-identical input (bench.py rule)
    corpus = synth_transcripts_distributed(spark, n_convs=n_convs, seed=42, partitions=64)
    corpus = assign_doc_ids(corpus, IndexConf(doc_id_method="hash")).persist()
    n_turns = corpus.count()

    out = tempfile.mkdtemp(prefix="igd_submit_")
    try:
        # warm-up build on a slice: first-build JIT + Python-worker spinup is
        # 2-3x and not steady-state throughput (same protocol as bench.py)
        build_index(spark, corpus.limit(5000), os.path.join(out, "warm"))
        shutil.rmtree(os.path.join(out, "warm"), ignore_errors=True)

        t0 = time.time()
        idx = build_index(spark, corpus, os.path.join(out, "idx"), IndexConf())
        build_s = time.time() - t0

        # query batch: terms drawn from the corpus itself (deterministic)
        qtexts = [
            r["text"]
            for r in corpus.orderBy("conv_id", "turn_idx").limit(200).collect()
        ]
        queries = spark.createDataFrame(
            [(i, " ".join(t.split()[:4])) for i, t in enumerate(qtexts)],
            "query_id long, query_text string",
        )
        search(spark, idx, queries.limit(10), k=10).count()  # warm-up
        t0 = time.time()
        res = search(spark, idx, queries, k=10)
        n_res = res.count()
        search_s = time.time() - t0

        print(
            json.dumps(
                {
                    "cores": cores,
                    "turns": n_turns,
                    "build_s": round(build_s, 2),
                    "build_tps": round(n_turns / build_s, 1),
                    "queries": len(qtexts),
                    "search_s": round(search_s, 2),
                    "qps": round(len(qtexts) / search_s, 1),
                    "result_rows": n_res,
                    "from_zip": from_zip,
                    "pkg_path": pkg_path,
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
