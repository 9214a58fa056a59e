"""Package igd_spark into a zip and run it via spark-submit --py-files at
two parallelism levels — the north rule's deployment shape, verified
end-to-end:

    spark-submit --master local[N]  --py-files /tmp/igd_spark.zip submit_job.py
    spark-submit --master local[4N] --py-files /tmp/igd_spark.zip submit_job.py

The job (scripts/submit_job.py) imports the engine ONLY from the zip
(asserted via from_zip in its JSON output — the subprocess cwd is a temp
dir so the repo checkout is not importable), builds an index over the
deterministic synthetic corpus, runs a 200-query BM25 batch, and prints
one JSON line. This script computes N -> 4N throughput scaling efficiency
from the two runs and prints a summary.

Usage: python scripts/submit_bench.py [N] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip() -> str:
    zpath = os.path.join(tempfile.gettempdir(), "igd_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "igd_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def submit(zpath: str, cores: int) -> dict:
    job = os.path.join(REPO, "scripts", "submit_job.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # engine must come from the zip alone
    out = subprocess.run(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--conf", "spark.sql.shuffle.partitions=32",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--py-files", zpath,
            job,
        ],
        capture_output=True, text=True, timeout=3600,
        cwd=tempfile.gettempdir(),  # repo not importable from cwd
        env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"spark-submit failed at local[{cores}]")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    zpath = make_zip()
    print(f"packaged {zpath} ({os.path.getsize(zpath)//1024} KiB)", file=sys.stderr)

    best: dict[int, dict] = {}
    for _ in range(reps):  # interleaved reps, best taken (VM noise protocol)
        for cores in (n, 4 * n):
            r = submit(zpath, cores)
            assert r["from_zip"], f"engine not imported from zip: {r['pkg_path']}"
            cur = best.get(cores)
            if cur is None:
                best[cores] = dict(r)
            else:  # track best build and best qps independently (noise decoupled)
                best_qps = max(cur["qps"], r["qps"])
                if r["build_tps"] > cur["build_tps"]:
                    best[cores] = dict(r)
                best[cores]["qps"] = best_qps
            print(f"local[{cores}]: {json.dumps(r)}", file=sys.stderr)

    rn, r4 = best[n], best[4 * n]
    eff_build = (r4["build_tps"] / rn["build_tps"]) / 4
    eff_search = (r4["qps"] / rn["qps"]) / 4
    print(
        json.dumps(
            {
                "deployment": "spark-submit --py-files igd_spark.zip",
                "N": rn,
                "4N": r4,
                "efficiency_build": round(eff_build, 3),
                "efficiency_search": round(eff_search, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
