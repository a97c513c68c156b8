"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N → 4N executor criterion
is evidenced by running the SAME pipeline job on the SAME input at
local[8] (N) and local[32] (4N), in separate JVMs, and reporting
throughput at both plus efficiency = (T_8 / T_32) / 4.

Usage:
  python scripts/scaling_bench.py [n_pages]          # orchestrate both runs
  python scripts/scaling_bench.py --run-one CPUS N   # single measured run
Writes BENCH_SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_PAGES = 60_000


def run_one(cpus: int, n_pages: int) -> None:
    sys.path.insert(0, REPO)
    from split_ner_spark.pipeline import run_pipeline
    from split_ner_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # steady-state warmup: a small full-pipeline run compiles every codegen
    # plan and forks the python worker pool, so the measured run reflects
    # data-proportional work, not one-time JIT (same discipline as the
    # reference's timing loop, main_qa.py:80-98, which averages post-warm).
    warm = tempfile.mkdtemp(prefix=f"scaling_warm_{cpus}_")
    try:
        run_pipeline(spark, warm, n_pages=max(2000, n_pages // 4), resume=False,
                     evaluate=False, triple_partitions=max(cpus * 2, 32),
                     granularity="fast")
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    walls = []
    summary = None
    for _rep in range(2):
        workdir = tempfile.mkdtemp(prefix=f"scaling_{cpus}_")
        try:
            t0 = time.time()
            summary = run_pipeline(
                spark, workdir, n_pages=n_pages, resume=False, evaluate=False,
                triple_partitions=max(cpus * 2, 32), granularity="fast",
            )
            walls.append(round(time.time() - t0, 2))
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    wall = min(walls)
    spark.stop()
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                "wall_s": wall,
                "walls": walls,
                "triples": summary["triples"],
                "triples_per_sec": round(summary["triples"] / wall, 2),
                "pages_per_sec": round(n_pages / wall, 2),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_PAGES
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-one",
             str(cpus), str(n_pages)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise SystemExit(f"run-one cpus={cpus} failed")
        results[cpus] = json.loads(line[-1][len("RESULT "):])
        print(f"local[{cpus}]: {results[cpus]}")
    t8, t32 = results[8]["wall_s"], results[32]["wall_s"]
    eff = (t8 / t32) / (32 / 8)
    out = {
        "protocol": "same job, same input, local[8] (N) vs local[32] (4N), "
                    "separate JVMs, steady-state (JVM+python workers warmed)",
        "n_pages": n_pages,
        "runs": results,
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
