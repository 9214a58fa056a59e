"""Extra benchmarks for optimization work (guide §1.4) — NOT the driver's
frozen bench.py. Times individual declared entries in isolation (count()
methodology identical to bench.py's entry loop), dumps
``.explain("formatted")`` plans to plans/r06/, and can time arbitrary
subsets:

    python bench_extra.py dsir_weights frequent_item_sets_agg
    python bench_extra.py --explain dedup_minhash_lsh
    python bench_extra.py --all-heavy
    python bench_extra.py --repeats 3 dedup_clusters

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per entry: name, rows, per-run seconds, min.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEAVY = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "duplicate_spans",
    "dsir_weights",
    "frequent_item_sets_agg",
    "significant_terms",
    "rescore_topk",
    "rank_eval",
    "context_turns_indexed",
    "multi_field_bm25_topk",
    "bm25_topk",
    "near_match_indexed",
    "phrase_match",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--all-heavy", action="store_true")
    ap.add_argument("--explain", action="store_true",
                    help="dump explain('formatted') to plans/r06/<name>_<tag>.txt")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of count()")
    args = ap.parse_args()

    from igd_spark.session import get_spark

    spark = get_spark(cores=CPUS, app="igd_bench_extra", shuffle_partitions=64)
    import __spark_entry__ as em

    names = list(args.entries)
    if args.all_heavy:
        names = HEAVY + [n for n in names if n not in HEAVY]
    qmap = em.queries()
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06"), exist_ok=True)
    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.explain:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06", f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(txt)
            print(f"{name}: plan -> {p}")
            df.unpersist(blocking=True)
        runs = []
        cnt = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                cnt = -1
            else:
                cnt = df.count()
            runs.append(time.perf_counter() - t0)
            df.unpersist(blocking=True)
        print(f"{name}: rows={cnt} runs={[round(r, 3) for r in runs]} "
              f"min={min(runs):.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
