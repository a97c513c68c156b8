"""Q4/Q5/A1 subword machinery: piece structure, label expansion, and the
first-subword back-mapping roundtrip (word labels → pieces → word tags)."""

from __future__ import annotations

from split_ner_spark import corpus
from split_ner_spark.ops.detect import detect_spans
from split_ner_spark.ops.segment import segment_pages
from split_ner_spark.ops.subword import (
    expand_labels_to_pieces,
    explode_subwords,
    map_pieces_to_tokens,
)


def _sentences(spark):
    return segment_pages(corpus.pages(corpus.gen_pages_with_gold(spark, 120)))


def test_explode_subwords_structure(spark):
    sub = explode_subwords(_sentences(spark))
    rows = sub.filter("url IS NOT NULL").limit(5000).collect()
    assert rows
    for r in rows:
        if r["piece_idx"] == 0:
            assert r["is_head"] and not r["piece"].startswith("##")
            assert 1 <= len(r["piece"]) <= 4
        else:
            assert not r["is_head"] and r["piece"].startswith("##")
    # piece_idx contiguous per (url, sent, offset)
    from pyspark.sql import functions as F

    bad = (
        sub.groupBy("url", "sent_id", "orig_offset")
        .agg(F.max("piece_idx").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert bad == 0


def test_a1_roundtrip_first_subword_mapping(spark):
    """word BIOES labels → pieces (Q5) → A1 back-mapping reproduces the
    BIO form of the original word labels exactly."""
    detected = detect_spans(_sentences(spark))
    mapped = map_pieces_to_tokens(expand_labels_to_pieces(detected))
    rows = mapped.select("labels", "token_tags").collect()
    assert rows
    for r in rows:
        expect = [
            "B-ENTITY" if lab in ("B", "S")
            else "I-ENTITY" if lab in ("I", "E")
            else "O"
            for lab in r["labels"]
        ]
        assert list(r["token_tags"]) == expect


def test_a1_first_wins_dedup(spark):
    from pyspark.sql import functions as F

    sents = _sentences(spark)
    doubled = sents.unionByName(
        sents.withColumn("url", F.concat(F.lit("dup-"), "url"))
    )
    mapped = map_pieces_to_tokens(expand_labels_to_pieces(detect_spans(doubled)))
    texts = [r["sent_text"] for r in mapped.select("sent_text").collect()]
    assert len(texts) == len(set(texts))  # one row per distinct sentence text
