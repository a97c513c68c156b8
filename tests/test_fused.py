"""Fused single-UDF path must be row-identical to the staged operators."""

from __future__ import annotations

from split_ner_spark import corpus
from split_ner_spark.ops.assemble import assemble_untyped
from split_ner_spark.ops.classify import classify_mentions
from split_ner_spark.ops.detect import detect_spans
from split_ner_spark.ops.fused import fused_mentions
from split_ner_spark.ops.segment import segment_pages


def test_fused_equals_staged(spark):
    n = 300
    staged = (
        classify_mentions(
            assemble_untyped(
                detect_spans(
                    segment_pages(corpus.pages(corpus.gen_pages_with_gold(spark, n)))
                )
            )
        )
        .drop("tokens")
        .select("url", "sent_id", "start", "end", "surface", "detect_score", "entity_type")
    )
    fused = fused_mentions(spark, n)
    a = sorted(map(tuple, staged.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b
    assert len(a) > 100


def test_fast_pipeline_matches_full(spark, tmp_path):
    from split_ner_spark.pipeline import run_pipeline

    full = run_pipeline(
        spark, str(tmp_path / "full"), n_pages=300, resume=False, evaluate=True
    )
    fast = run_pipeline(
        spark, str(tmp_path / "fast"), n_pages=300, resume=False, evaluate=True,
        granularity="fast",
    )
    assert fast["triples"] == full["triples"]
    assert fast["triple_match"]["precision"] == full["triple_match"]["precision"]
    assert fast["triple_match"]["recall"] == full["triple_match"]["recall"]
    assert fast["triple_match"]["recall"] >= 0.95
