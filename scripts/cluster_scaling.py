"""Executor-JVM-isolated N→4N scaling evidence.

Same protocol as scripts/scaling_bench.py (bench.py in fresh
subprocesses, identical pinned-partition input, interleaved reps, best
taken) but each parallelism level runs under
``--master local-cluster[K,1,mem]``: K standalone executor processes,
each with its OWN JVM heap, GC, and Python-worker pool — the closest
sandbox analog to a real multi-executor cluster, and the protocol the
round-4 review asked for to separate shared-JVM/allocator effects from
the shared memory bus.  The only resource still shared across executors
is the DRAM bus itself (hardware; every multi-socket executor pair on a
real cluster node shares one too).

Levels: K (default 2) vs 4K single-core executors, so 2→8 matches the
historical window B.  Writes CLUSTER_SCALING.json and prints a one-line
summary.

Usage: python scripts/cluster_scaling.py [sf_dir] [K] [worker_mb]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING_CONVS = os.environ.get("IGD_BENCH_CONVS", "100000")


def run_bench(sf_dir: str, k_exec: int, worker_mb: int) -> dict:
    env = dict(
        os.environ,
        # executor JVMs fork their python workers with the parent env, not
        # the driver's sys.path — the package must be on PYTHONPATH (the
        # local-cluster analog of spark-submit --py-files; submit_bench.py
        # covers the real zip-shipping shape)
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(k_exec),
        IGD_SPARK_MASTER=f"local-cluster[{k_exec},1,{worker_mb}]",
        IGD_SPARK_EXECUTOR_MEM=f"{max(worker_mb - 1024, 1024)}m",
        IGD_BENCH_CONVS=SCALING_CONVS,
        IGD_BENCH_HEADLINE_ONLY="1",
        IGD_BENCH_BIGQ="1",
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py failed at executors={k_exec}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["subprocess_wall"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    worker_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 6144
    k4 = 4 * k
    reps = int(os.environ.get("SCALING_REPS", "2"))

    # warm the shared pinned-partition corpus (untimed) at the wide level
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    corpus = os.path.join(
        __import__("tempfile").gettempdir(),
        f"igd_bench_corpus_sf{sf}_c{SCALING_CONVS}",
    )
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        print(f"== warm corpus via executors={k4}", file=sys.stderr)
        run_bench(sf_dir, k4, worker_mb)

    def merge_best(runs: list[dict]) -> dict:
        best = dict(runs[0])
        for r in runs[1:]:
            for metric in (
                "build_turns_per_sec", "search_qps", "search_qps_1000q",
                "search_qps_10kq",
            ):
                if r[metric] > best[metric]:
                    best[metric] = r[metric]
        return best

    runs_n, runs_4n = [], []
    for i in range(reps):
        print(f"== measured run executors={k} rep={i}", file=sys.stderr)
        runs_n.append(run_bench(sf_dir, k, worker_mb))
        print(f"== measured run executors={k4} rep={i}", file=sys.stderr)
        runs_4n.append(run_bench(sf_dir, k4, worker_mb))
    r_n, r_4n = merge_best(runs_n), merge_best(runs_4n)

    def eff(metric: str) -> float:
        return round((r_4n[metric] / r_n[metric]) / 4, 3)

    summary = {
        "protocol": (
            f"bench.py (pinned 64-partition input/shuffle) under "
            f"local-cluster[{k},1,{worker_mb}] vs "
            f"local-cluster[{k4},1,{worker_mb}]: {k} vs {k4} single-core "
            "executors, each its own JVM + python workers; fresh driver "
            f"JVM per run; {reps} interleaved reps, best throughput taken"
        ),
        "n_turns": r_n.get("n_turns"),
        "build_eff": eff("build_turns_per_sec"),
        "search_eff_100q": eff("search_qps"),
        "search_eff_1000q": eff("search_qps_1000q"),
        "search_eff_10kq": eff("search_qps_10kq"),
        "N": {m: r_n[m] for m in (
            "build_turns_per_sec", "search_qps", "search_qps_1000q",
            "search_qps_10kq")},
        "4N": {m: r_4n[m] for m in (
            "build_turns_per_sec", "search_qps", "search_qps_1000q",
            "search_qps_10kq")},
        "raw": {"N": runs_n, "4N": runs_4n},
    }
    with open(os.path.join(REPO, "CLUSTER_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k2: v for k2, v in summary.items() if k2 != "raw"}))


if __name__ == "__main__":
    main()
