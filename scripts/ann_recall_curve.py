"""Recall@k-vs-cost curve for the banded multi-probe RP-LSH ANN path.

For each probe depth, reports recall@5 against the brute-force cosine
oracle plus the candidate-verification volume (the cost that actually
scales: exact-cosine evaluations per query). Prints one JSON line; the
table in BASELINE.md is generated from this script.

Usage: python3 scripts/ann_recall_curve.py  [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from split_ner_spark.ops import simsearch  # noqa: E402
from split_ner_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="ann-recall-curve", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_corpus = emb.count()
    n_queries, k = 10, 5

    exact = (
        simsearch.cosine_topk(emb, n_queries, k)
        .select("query_id", "neighbor_id")
        .cache()
    )
    n_exact = exact.count()

    curve = []
    for probes in (0, 1, 2, 3):
        t0 = time.time()
        cand = simsearch.rp_lsh_candidates(emb, n_queries, probes=probes)
        n_cand = cand.count()
        approx = simsearch.rp_lsh_topk(emb, n_queries, k, probes=probes).select(
            "query_id", "neighbor_id"
        )
        n_hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        curve.append(
            {
                "probes": probes,
                "recall_at_5": round(n_hit / n_exact, 4),
                "candidates_per_query": round(n_cand / n_queries, 1),
                "candidate_fraction_of_corpus": round(n_cand / n_queries / n_corpus, 4),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "k": k,
                "bits": simsearch.RP_BITS,
                "bands": simsearch.RP_BANDS,
                "curve": curve,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
