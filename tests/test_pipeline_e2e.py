"""End-to-end pipeline: byte identity, triple P/R gate, resume, lineage."""

import json
import os

import pytest
from pyspark.sql import functions as F

from split_ner_spark import corpus
from split_ner_spark import reference_impl as R
from split_ner_spark.ops.metrics import per_tag_counts, f1_report
from split_ner_spark.ops.segment import extracted_text
from split_ner_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("kgwork"))


@pytest.fixture(scope="module")
def summary(spark, workdir):
    return run_pipeline(spark, workdir, n_pages=400)


def test_triple_pr_gate(summary):
    m = summary["triple_match"]
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m
    # and not trivially perfect — noise must be present and detected
    assert m["precision"] < 1.0 or m["recall"] < 1.0


def test_stage_rows_sane(summary):
    rows = summary["rows"]
    assert rows["pages_gold"] == 400
    assert rows["sentences"] > rows["pages_gold"]
    assert rows["detected"] == rows["sentences"]
    assert rows["mentions"] == rows["linked"]
    assert rows["triples"] > 0


def test_resume_skips_committed_stages(spark, workdir, summary):
    # all stages committed → rerun must not rebuild anything (fast) and
    # must produce the identical report
    s2 = run_pipeline(spark, workdir, n_pages=400)
    assert s2["rows"] == summary["rows"]
    assert s2["triple_match"] == summary["triple_match"]


def test_kill_and_rerun_from_partial(spark, workdir, summary):
    os.remove(os.path.join(workdir, "_COMMIT.triples.json"))
    s3 = run_pipeline(spark, workdir, n_pages=400)
    assert s3["rows"] == summary["rows"]
    assert s3["triple_match"] == summary["triple_match"]


def test_lineage_records(workdir, summary):
    lines = [json.loads(l) for l in open(os.path.join(workdir, "_lineage.jsonl"))]
    stages = {l["stage"] for l in lines}
    assert {"pages_gold", "sentences", "detected", "mentions", "linked", "triples"} <= stages
    part_lines = [l for l in lines if "metric" not in l]
    assert all(
        l["rows"] >= 0 and l["wall_ms"] >= 0 and l["partition_file"]
        for l in part_lines
    )
    # the co-occurrence cap metric (VERDICT r4 #3) rides the triples stage:
    # a 100 TB operator can see how often the degenerate-sentence truncation
    # fired without re-running anything
    caps = [l for l in lines if l.get("metric") == "cooccur_cap"]
    assert caps, "cooccur_cap metric row missing from lineage"
    assert caps[-1]["n_sentences"] > 0
    assert 0 <= caps[-1]["n_capped_sentences"] <= caps[-1]["n_sentences"]
    # normal corpus sentences have tens of entities — nothing should cap
    assert caps[-1]["n_capped_sentences"] == 0
    assert summary["cooccur_cap"] == {
        "n_capped_sentences": caps[-1]["n_capped_sentences"],
        "n_sentences": caps[-1]["n_sentences"],
    }


def test_byte_identity_extraction(spark):
    """sha256(extract(text)) must equal sha256 of the generator's text —
    and the html-only path must reproduce it from the html column."""
    pg = corpus.gen_pages_with_gold(spark, 60).cache()
    pages = corpus.pages(pg)
    ext = extracted_text(pages)
    rows = ext.join(pages.select("url", "text"), "url").collect()
    assert len(rows) == 60
    for r in rows:
        assert r["text_extracted"] == r["text"]
        assert r["text_sha256"] == R.text_sha256(r["text"])
    # html-only: drop text, extract from html binary
    ext2 = extracted_text(pages.withColumn("text", F.lit(None).cast("string")), use_html=True)
    rows2 = {r["url"]: r["text_extracted"] for r in ext2.collect()}
    for r in rows:
        assert rows2[r["url"]] == r["text_extracted"]


def test_generator_is_partitioning_invariant(spark):
    a = corpus.gen_pages_with_gold(spark, 50, partitions=1).select("url", "text", "lang")
    b = corpus.gen_pages_with_gold(spark, 50, partitions=7).select("url", "text", "lang")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stage_f1_report(spark, workdir, summary):
    """Per-stage F1 (detect & classify) via the E1/E2 operators."""
    pg = corpus.gen_pages_with_gold(spark, 400).cache()
    gold = corpus.gold_mentions(pg)
    mentions = spark.read.parquet(os.path.join(workdir, "mentions"))
    keys = ["url", "sent_id", "start", "end"]
    # detect-stage (untyped): tag column constant
    det_counts = per_tag_counts(
        mentions.withColumn("entity_type", F.lit("ENTITY")),
        gold.withColumn("entity_type", F.lit("ENTITY")),
        keys,
    )
    rep = {r["tag"]: r for r in f1_report(det_counts).collect()}
    assert rep["__micro__"]["f1"] > 0.95
    # classify-stage (typed key)
    cls_counts = per_tag_counts(mentions, gold, keys)
    rep2 = {r["tag"]: r for r in f1_report(cls_counts).collect()}
    assert rep2["__micro__"]["f1"] > 0.93
    assert rep2["__macro__"]["f1"] > 0.9
    # epsilon math parity with the pure-Python spec (micro over ALL tags,
    # macro over gold tags only — analysis.py:60-62)
    per_tag = {r["tag"]: (r["tp"], r["fp"], r["fn"]) for r in cls_counts.collect()}
    (mp, mr, mf1), _ = R.micro_macro(per_tag)
    gold_tags = {t: v for t, v in per_tag.items() if v[0] + v[2] > 0}
    _, macro = R.micro_macro(gold_tags)
    assert abs(rep2["__micro__"]["f1"] - mf1) < 1e-12
    assert abs(rep2["__macro__"]["f1"] - macro) < 1e-12


def test_sources_fallback_roundtrip(spark, tmp_path):
    """Iceberg jar absent in this container → the source layer must fall
    back to the atomic-parquet committer with identical semantics."""
    from split_ner_spark import sources

    assert sources.iceberg_available(spark) is False
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    committed = sources.write_table(df, "t1", str(tmp_path), ["k"])
    assert committed.count() == 100
    again = sources.read_table(spark, "t1", str(tmp_path))
    assert sorted(r["id"] for r in again.collect()) == list(range(100))
