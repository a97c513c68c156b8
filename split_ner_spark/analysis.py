"""X4 — multi-seed run aggregation over ACTUAL pipeline runs.

Reference semantics (/root/reference/splitner/analysis_multirun.py:427-446):
train/evaluate with several fixed seeds (the reference uses
{142, 242, 342, 442}) and report the mean mention-level micro-F1 across
runs. Round 1 shipped only the exact-moment mean/stddev operator on a
static table; this module closes the loop: it RUNS the detect stage per
seed (each seed generates its own corpus AND therefore its own
noise draw — the planted FN/FP noise of corpus.py is seed-keyed), scores
each run with the E1/E2 operators, and aggregates the per-seed micro-F1
with the same order-independent exact-moment arithmetic as
``queries.events_value_stats``.

Everything distributed: per-seed runs are Spark jobs; only the per-seed
scalar F1 rows (a handful of doubles) reach the driver-side union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import corpus
from .ops.metrics import f1_report, per_tag_counts

MULTIRUN_SEEDS = [142, 242, 342, 442]  # analysis_multirun.py:431


def detect_micro_f1(spark: SparkSession, n_pages: int, seed: int) -> float:
    """One run: corpus(seed) → fused detect/classify → typed-mention
    micro-F1 vs that corpus's planted goldens (E1/E2 operators)."""
    from .ops.fused import fused_mentions

    pg = corpus.gen_pages_with_gold(spark, n_pages, seed)
    pred = fused_mentions(spark, n_pages, seed).select(
        "url", "sent_id", "start", "end", "entity_type"
    )
    gold = corpus.gold_mentions(pg).select(
        "url", "sent_id", "start", "end", "entity_type"
    )
    counts = per_tag_counts(pred, gold, ["url", "sent_id", "start", "end"])
    micro = (
        f1_report(counts)
        .filter(F.col("tag") == "__micro__")
        .select("f1")
        .collect()[0]["f1"]
    )
    return float(micro)


def multirun_f1_stats(
    spark: SparkSession,
    n_pages: int = 300,
    seeds: list[int] | None = None,
) -> DataFrame:
    """Mean/stddev micro-F1 across seeds — one row. The stddev uses the
    integerized exact-moment sums (order-independent; see queries._isum).
    """
    seeds = seeds or MULTIRUN_SEEDS
    rows = [(s, detect_micro_f1(spark, n_pages, s)) for s in seeds]
    df = spark.createDataFrame(rows, "seed int, micro_f1 double")
    vi = F.round(F.col("micro_f1") * 1_000_000).cast("long")
    agg = df.agg(
        F.count("*").alias("n_runs"),
        F.sum(vi).alias("_s"),
        F.sum(vi * vi).alias("_ss"),
    )
    s = F.col("_s").cast("double") / 1_000_000
    ss = F.col("_ss").cast("double") / (1_000_000.0 * 1_000_000.0)
    n = F.col("n_runs").cast("double")
    var = (ss - s * s / n) / (n - F.lit(1.0))
    return agg.select(
        "n_runs",
        (s / n).alias("mean_micro_f1"),
        F.sqrt(var).alias("stddev_micro_f1"),
    )
