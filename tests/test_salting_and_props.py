"""G1 skew evidence + randomized W3 equivalence.

- the salted triple write must spread a Zipf-hot subject across
  partitions (max partition ≪ the hot subject's row count);
- Spark's array-fold BIO/BIOES assemblers must equal the pure-python
  reference twins on randomized label sequences (hypothesis drives the
  python side; Spark is checked batch-wise on the same inputs).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from split_ner_spark.ops.assemble import spans_bio_col, spans_bioes_col
from split_ner_spark.ops.triples import salted_by_subject
from split_ner_spark.reference_impl import get_spans_bio, get_spans_bioes


def test_salting_spreads_hot_subject(spark):
    rows = [("hot:entity", "mentioned_in", f"url{i}") for i in range(20000)]
    rows += [(f"cold:{i % 500}", "mentioned_in", f"url{i}") for i in range(5000)]
    tri = spark.createDataFrame(rows, "subj string, pred string, obj string")
    n_part = 16
    salted = salted_by_subject(tri, n_partitions=n_part, n_salts=16)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    max_part = max(r["count"] for r in sizes)
    # unsalted, the hot subject's 20k rows land in ONE partition; salted,
    # no partition should hold more than ~a quarter of them
    assert max_part < 8000, f"hot key not spread: max partition {max_part}"
    assert salted.count() == 25000  # nothing lost


def _random_bio_tags(rng: random.Random, n: int) -> list[str]:
    tags = []
    for _ in range(n):
        r = rng.random()
        if r < 0.5:
            tags.append("O")
        elif r < 0.75:
            tags.append("B-" + rng.choice("XY"))
        else:
            tags.append("I-" + rng.choice("XY"))
    return tags


def test_spark_bio_assembler_equals_python_on_random_tags(spark):
    rng = random.Random(1234)
    cases = [_random_bio_tags(rng, rng.randint(0, 24)) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, tags array<string>"
    )
    got = {
        r["i"]: [(s["tag"], s["start"], s["end"]) for s in r["spans"]]
        for r in df.select("i", spans_bio_col("tags").alias("spans")).collect()
    }
    for i, tags in enumerate(cases):
        assert got[i] == get_spans_bio(tags), f"case {i}: {tags}"


def test_spark_bioes_assembler_equals_python_on_random_labels(spark):
    rng = random.Random(99)
    cases = [
        [rng.choice("OBIES") for _ in range(rng.randint(0, 24))]
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, labels array<string>"
    )
    got = {
        r["i"]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in df.select("i", spans_bioes_col("labels").alias("spans")).collect()
    }
    for i, labels in enumerate(cases):
        assert got[i] == get_spans_bioes(labels), f"case {i}: {labels}"


def test_cooccurrence_degenerate_sentence_cap(spark):
    """A pathological sentence with more than max_entities distinct ids
    contributes pairs only among its lexicographically-first 1024 ids
    (PLANS.md round-4 measurement: uncapped, one such key turned a 2.7s
    stage into 101.8s — AQE cannot split a single aggregate key)."""
    from pyspark.sql import functions as F

    from split_ner_spark.ops.triples import cooccurrence_pairs

    hot = spark.range(1500).select(
        F.lit("HOTURL").alias("url"),
        F.lit(0).alias("sent_id"),
        F.format_string("hot%06d", F.col("id")).alias("canonical_id"),
        F.lit("t").alias("entity_type"),
    )
    n = cooccurrence_pairs(hot).count()
    assert n == 1024 * 1023 // 2
    # under the cap: exact all-pairs semantics
    small = spark.range(10).select(
        F.lit("u").alias("url"), F.lit(0).alias("sent_id"),
        F.format_string("e%02d", F.col("id")).alias("canonical_id"),
        F.lit("t").alias("entity_type"),
    )
    assert cooccurrence_pairs(small).count() == 45
