"""Benchmark harness: headline queries + the full KG pipeline at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": ...}

The pipeline stage (synthetic corpus scaled to the sf, full
segment→detect→assemble→classify→link→triples run with committed stage
tables) is the BASELINE.json headline — its triples/sec is reported
alongside per-query latencies. Scaling-efficiency evidence (same job at
local[8] vs local[32]) lives in scripts/scaling_bench.py / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from split_ner_spark import corpus  # noqa: E402
from split_ner_spark.pipeline import run_pipeline  # noqa: E402
from split_ner_spark.queries import QUERIES, drain_cache  # noqa: E402
from split_ner_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "kg_span_assembly",
    "kg_eval_f1",
    "kg_cooccurrence",
    "pricing_summary",
    "top_suppliers_per_nation",
    "events_sessionize",
    "text_quality",
    "text_lang_id",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_lsh_jaccard",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "emb_near_dup",
    "kg_linked_triples",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    spark = get_spark(app_name="split-ner-spark-bench", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    t_all = time.time()

    # warm the JVM/python workers once so per-query numbers are not
    # dominated by first-job startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    # Protocol (round 3): the HEADLINE number for every query and for the
    # pipeline is the MEDIAN of the measured runs — the throughput you'd
    # actually sustain; the minimum is still reported separately as
    # "best observed" (capability under a clean hypervisor-noise window).
    timings_best: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = QUERIES[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            assert n >= 0
            # queries may persist shared subplans (e.g. the dedup shingle
            # frame); drain the deferred-unpersist registry (also frees the
            # Python-side references) and drop any stragglers so per-query
            # numbers stay independent
            drain_cache()
            spark.catalog.clearCache()
        timings[name] = statistics.median(runs)
        timings_best[name] = min(runs)

    # full KG pipeline at a corpus size proportional to the sf: 2M pages
    # at sf=0.1 — the SAME size as BENCH_SCALING.json, so the headline
    # triples/sec and the scaling evidence are one consistent number.
    # (r01 measured 200k pages, where ~25-30s of fixed costs — the ~40
    # small link/canon/commit jobs — plus up-to-3x JVM stage variance
    # dominated the wall and made per-page throughput look 8x worse than
    # the 2M-page scaling run; measured breakdown in BASELINE.md.)
    n_pages = max(2_000, int(20_000_000 * sf))
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    # warmup at 1/10 size compiles the pipeline's codegen plans so the
    # measured number is steady-state (reference's timing loop does the
    # same, main_qa.py:80-98)
    warm = tempfile.mkdtemp(prefix="bench_warm_", dir=tmp_root)
    try:
        run_pipeline(spark, warm, n_pages=max(200, n_pages // 10),
                     resume=False, evaluate=False,
                     triple_partitions=max(cpus * 2, 32), granularity="fast")
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    # three measured runs, SAME steady-state protocol as
    # scripts/scaling_bench.py (warmup first, so JIT has settled).
    # Hypervisor noise on this VM arrives in minutes-long windows
    # (measured swings: the same 2M-page run 56s vs 102s an hour apart);
    # the MEDIAN wall is the headline, the min is "best observed", and
    # every raw wall is reported.
    walls = []
    summary = None
    for _ in range(3):
        workdir = tempfile.mkdtemp(prefix="bench_pipeline_", dir=tmp_root)
        try:
            t0 = time.time()
            summary = run_pipeline(
                spark, workdir, n_pages=n_pages, resume=False, evaluate=False,
                triple_partitions=max(cpus * 2, 32), granularity="fast",
            )
            walls.append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    timings["kg_pipeline"] = statistics.median(walls)
    timings_best["kg_pipeline"] = min(walls)

    total = round(time.time() - t_all, 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "protocol": "headline = median of 3 measured runs (post-warmup); "
                    "queries_best_observed / *_best_observed = min of the "
                    "same runs; all pipeline walls in pipeline_walls",
        "queries": timings,
        "queries_best_observed": timings_best,
        "sf": sf,
        "cpus": cpus,
        "pipeline_pages": n_pages,
        "pipeline_triples": summary["triples"],
        "pipeline_walls": walls,
        "triples_per_sec": round(summary["triples"] / timings["kg_pipeline"], 2),
        "pages_per_sec": round(n_pages / timings["kg_pipeline"], 2),
        "triples_per_sec_best_observed": round(summary["triples"] / min(walls), 2),
        "pages_per_sec_best_observed": round(n_pages / min(walls), 2),
    }
    # attach the latest two-cluster-size evidence (scripts/scaling_bench.py)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            s = json.load(fh)
        out["scaling"] = {
            "protocol": s.get("protocol"),
            "n_pages": s.get("n_pages"),
            "job_efficiency_N_to_4N": s.get("job_scaling_efficiency"),
            "udf_stage_efficiency_N_to_4N": s.get("udf_stage_scaling_efficiency"),
            "hardware_ceiling_efficiency": s.get("hardware_ceiling", {}).get(
                "ceiling_efficiency"
            ),
            "triples_per_sec_N": s.get("runs", {}).get("4", {}).get("triples_per_sec"),
            "triples_per_sec_4N": s.get("runs", {}).get("16", {}).get("triples_per_sec"),
        }
    spark.stop()
    line = json.dumps(out)
    # ALSO write the summary to a file: the round-3 driver's stdout tail
    # capture truncated the final JSON line mid-stream (BENCH_r03.json
    # `parsed: null`), so the artifact must never depend on stdout alone.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_SUMMARY.json"), "w"
    ) as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
