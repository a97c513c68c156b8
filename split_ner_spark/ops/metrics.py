"""E1/E2 — mention-level evaluation as joins + aggregates.

Reference semantics:
- TP/FP/FN matching = exact-equality set membership of Span keys per
  sentence (/root/reference/splitner/analysis.py:41-49,
  evaluator.py:28-39) → semi/anti equi-joins on the full span key;
- micro F1 = P/R/F1 over summed counts, macro F1 = mean of per-tag F1,
  with epsilon placement exactly as analysis.py:54-74 (eps=1e-7) /
  evaluator.py:171-199 (eps=1e-9). The epsilon lives in the DENOMINATOR
  of each ratio, and macro divides by (n_tags + eps).

All Catalyst: hash semi/anti joins + partial/final hash aggregation; no
Python in the hot path. The same operators score both pipeline stages
(detect-only via untyped keys, classify via typed keys) — the reference
does this with its --span_based relabel (analysis.py:387-397).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS_ANALYSIS = 1e-7  # analysis.py:54-56
EPS_EVALUATOR = 1e-9  # evaluator.py:171,181


def match_counts(pred: DataFrame, gold: DataFrame, keys: list[str]) -> tuple[int, int, int]:
    """(tp, fp, fn) by exact span-key match. One job per count; use
    :func:`per_tag_counts` for the full report in a single pass."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    tp = p.join(g, keys, "left_semi").count()
    fp = p.join(g, keys, "left_anti").count()
    fn = g.join(p, keys, "left_anti").count()
    return tp, fp, fn


def per_tag_counts(
    pred: DataFrame, gold: DataFrame, keys: list[str], tag_col: str = "entity_type"
) -> DataFrame:
    """(tag, tp, fp, fn) in one shuffle: full-outer join on the span key
    (tag included in the key — a type mismatch is FP+FN, as in the
    reference's exact Span equality, evaluator.py:119-133)."""
    k = keys + [tag_col]
    p = pred.select(*k).distinct().withColumn("_p", F.lit(1))
    g = gold.select(*k).distinct().withColumn("_g", F.lit(1))
    j = p.join(g, k, "full_outer")
    return (
        j.groupBy(F.col(tag_col).alias("tag"))
        .agg(
            F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(F.col("_p").isNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("fn"),
        )
    )


def _prf1_cols(eps: float):
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    p = tp * 1.0 / (tp + fp + F.lit(eps))
    r = tp * 1.0 / (tp + fn + F.lit(eps))
    f1 = F.lit(2.0) * p * r / (p + r + F.lit(eps))
    return p.alias("p"), r.alias("r"), f1.alias("f1")


def f1_report(counts: DataFrame, eps: float = EPS_ANALYSIS) -> DataFrame:
    """per-tag rows + 'micro' + 'macro' summary rows, reference math.

    Output: (tag, cnt, tp, fp, fn, p, r, f1); micro sums counts first
    (analysis.py:50-56), macro averages per-tag F1 over (n_tags + eps)
    (analysis.py:73)."""
    per_tag = counts.select(
        "tag",
        (F.col("tp") + F.col("fn")).alias("cnt"),
        "tp",
        "fp",
        "fn",
        *_prf1_cols(eps),
    )
    micro = (
        counts.agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
        )
        .select(
            F.lit("__micro__").alias("tag"),
            (F.col("tp") + F.col("fn")).alias("cnt"),
            "tp",
            "fp",
            "fn",
            *_prf1_cols(eps),
        )
    )
    # reference macro ranges over tags present in GOLD (tp∪fn keys,
    # analysis.py:60-62); FP-only tags count in micro but not macro.
    macro = per_tag.filter((F.col("tp") + F.col("fn")) > 0).agg(
        (F.sum("f1") / (F.count("*") + F.lit(eps))).alias("f1")
    ).select(
        F.lit("__macro__").alias("tag"),
        F.lit(None).cast("long").alias("cnt"),
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("long").alias("fp"),
        F.lit(None).cast("long").alias("fn"),
        F.lit(None).cast("double").alias("p"),
        F.lit(None).cast("double").alias("r"),
        "f1",
    )
    return per_tag.unionByName(micro).unionByName(macro)


def triple_pr(emitted: DataFrame, golden: DataFrame) -> dict:
    """Exact (subj, pred, obj) match — the BASELINE.json P/R≥0.95 gate."""
    k = ["subj", "pred", "obj"]
    e = emitted.select(*k).distinct()
    g = golden.select(*k).distinct()
    tp = e.join(g, k, "left_semi").count()
    n_e = e.count()
    n_g = g.count()
    p = tp / n_e if n_e else 0.0
    r = tp / n_g if n_g else 0.0
    return {
        "tp": tp,
        "emitted": n_e,
        "golden": n_g,
        "precision": p,
        "recall": r,
        "f1": 2 * p * r / (p + r) if (p + r) else 0.0,
    }


def confusion_matrix(
    pred: DataFrame, gold: DataFrame, keys: list[str], tag_col: str = "entity_type"
) -> DataFrame:
    """X1 — gold×pred counts on matched span keys (analysis.py:102-111);
    pivot aggregate."""
    p = pred.select(*keys, F.col(tag_col).alias("pred_tag"))
    g = gold.select(*keys, F.col(tag_col).alias("gold_tag"))
    return (
        g.join(p, keys)
        .groupBy("gold_tag")
        .pivot("pred_tag")
        .count()
        .na.fill(0)
    )


def overlap_analysis(
    pred: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """X2 — interval join of gold/pred spans in the same sentence with the
    reference's overlap predicate ``not (p.start > g.end or p.end <
    g.start)`` (analysis.py:155-254), classified into boundary-error
    categories."""
    keys = keys or ["url", "sent_id"]
    p = pred.select(
        *keys,
        F.col("start").alias("p_start"),
        F.col("end").alias("p_end"),
        F.col("entity_type").alias("p_tag"),
    )
    g = gold.select(
        *keys,
        F.col("start").alias("g_start"),
        F.col("end").alias("g_end"),
        F.col("entity_type").alias("g_tag"),
    )
    j = p.join(g, keys).filter(
        ~((F.col("p_start") > F.col("g_end")) | (F.col("p_end") < F.col("g_start")))
    )
    kind = (
        F.when((F.col("p_start") == F.col("g_start")) & (F.col("p_end") == F.col("g_end")) & (F.col("p_tag") == F.col("g_tag")), "exact")
        .when((F.col("p_start") == F.col("g_start")) & (F.col("p_end") == F.col("g_end")), "type_mismatch")
        .when((F.col("p_start") > F.col("g_start")) & (F.col("p_end") == F.col("g_end")), "missed_prefix")
        .when((F.col("p_start") < F.col("g_start")) & (F.col("p_end") == F.col("g_end")), "extra_prefix")
        .when((F.col("p_start") == F.col("g_start")) & (F.col("p_end") < F.col("g_end")), "missed_suffix")
        .when((F.col("p_start") == F.col("g_start")) & (F.col("p_end") > F.col("g_end")), "extra_suffix")
        .when((F.col("p_start") > F.col("g_start")) & (F.col("p_end") < F.col("g_end")), "inner")
        .when((F.col("p_start") < F.col("g_start")) & (F.col("p_end") > F.col("g_end")), "outer")
        .otherwise("partial_shift")
    )
    return j.withColumn("overlap_kind", kind)


def oov_error_terms(errors: DataFrame, train_vocab: DataFrame, term_col: str = "surface") -> DataFrame:
    """X3 — error surfaces absent from the train vocabulary: anti join
    (analysis.py:308-349)."""
    v = train_vocab.select(F.col(train_vocab.columns[0]).alias(term_col)).distinct()
    return errors.join(v, term_col, "left_anti")


def prediction_diff(run_a: DataFrame, run_b: DataFrame, key: str = "sent_text") -> DataFrame:
    """X7 — align two prediction sets by sentence text, keep divergences
    (general.py:608-647): full outer join + inequality filter."""
    a = run_a.select(F.col(key), F.col("labels").alias("labels_a"))
    b = run_b.select(F.col(key), F.col("labels").alias("labels_b"))
    return a.join(b, key, "full_outer").filter(
        F.col("labels_a").isNull()
        | F.col("labels_b").isNull()
        | (F.col("labels_a") != F.col("labels_b"))
    )
