"""Physical-plan contracts (round 4): the plan properties PLANS.md claims
are now pinned executable, so a refactor that silently de-optimizes a
plan (drops a pushdown, turns a broadcast into a sort-merge join, adds a
shuffle, introduces a row-at-a-time Python UDF or a non-broadcast
cartesian) fails CI instead of surfacing as a 100 TB regression.

All assertions inspect the executed-plan STRING (planning only — none of
the single-purpose tests execute the query; the registry sweep builds
every query's plan, which for a few eager operators runs their small
driver-side jobs at sf0.001).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from split_ner_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_segment_scan_pushdown_and_pruning(spark, tmp_path):
    """The lang filter reaches the parquet scan and the html column is
    never read (PLANS.md P1: at 100 TB this skips ~8% of pages and the
    whole binary column)."""
    from split_ner_spark import corpus
    from split_ner_spark.ops.segment import segment_pages

    pg = corpus.gen_pages_with_gold(spark, 30)
    path = str(tmp_path / "pages")
    corpus.pages(pg).write.mode("overwrite").parquet(path)
    p = plan_of(segment_pages(spark.read.parquet(path)))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed and "EqualTo(lang,en)" in pushed.group(1), p[:2000]
    schema = re.search(r"ReadSchema: ([^\n]*)", p)
    assert schema and "html" not in schema.group(1), schema.group(1)


def test_link_joins_are_broadcast(spark):
    """Every join in the link cascade broadcasts the dimension side —
    no SortMergeJoin may appear (the fact table must not shuffle)."""
    from split_ner_spark.ops.link import link_mentions

    mentions = spark.createDataFrame(
        [("u", 0, "Spark", "t")] * 5,
        "url string, sent_id int, surface string, entity_type string",
    )
    alias = spark.createDataFrame(
        [("spark", "eng:spark", "engine")],
        "alias string, canonical_id string, entity_type string",
    )
    p = plan_of(link_mentions(mentions, alias, fuzzy=False))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_cooccurrence_single_shuffle(spark):
    """The co-occurrence set-build is ONE shuffle (the collect_set
    groupBy); the in-row pair expansion must not add Exchanges."""
    from split_ner_spark.ops.triples import cooccurrence_pairs

    linked = spark.createDataFrame(
        [("u", 0, "a", "t")] * 5,
        "url string, sent_id int, canonical_id string, entity_type string",
    )
    assert plan_of(cooccurrence_pairs(linked)).count("Exchange") == 1


def test_x6_single_shuffle(spark):
    """X6 pattern mining: zero shuffle before the single final hash
    aggregate — the whole window grid is array transforms in one
    projection (PLANS.md). The round-6 scan fan-out (queries.load: an
    explicit round-robin repartition when the input is an unsplittable
    small file) is the one additional allowed Exchange; the contract here
    is about HASH exchanges introduced by the operator itself."""
    p = plan_of(Q.q_kg_mention_contexts(spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    assert p.count("Exchange") <= 2, p[:2000]


def test_salted_write_no_join(spark):
    """Round 4: hot-subject salting is an isin literal — no broadcast
    join, exactly the one repartition Exchange."""
    from split_ner_spark.ops.triples import salted_by_subject

    tri = spark.createDataFrame(
        [("s", "p", "o")] * 5, "subj string, pred string, obj string"
    )
    p = plan_of(salted_by_subject(tri, 4, hot_subjects=["s"]))
    assert p.count("Exchange") == 1
    assert "Join" not in p


def test_no_cartesian_in_lsh_candidates(spark):
    """MinHash-LSH candidate generation is an equi-join on band keys —
    never a cartesian or nested-loop join."""
    from split_ner_spark.ops import dedup

    p = plan_of(dedup.minhash_lsh_pairs(Q.load(spark, SF_DIR, "documents")))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


@pytest.mark.slow
def test_registry_sweep_no_row_udf_no_cartesian(spark):
    """Across EVERY queries() entry: no row-at-a-time Python UDF
    (BatchEvalPython) and no non-broadcast cartesian product anywhere.
    Arrow-batched UDFs (ArrowEvalPython / MapInPandas) and broadcast
    nested-loop joins (tiny side by construction: the brute-force ANN
    oracle's query rows, Q2's tag dim, count scalars) are the allowed
    plan shapes."""
    offenders = {}
    for name in sorted(Q.QUERIES):
        p = plan_of(Q.QUERIES[name](spark, SF_DIR))
        bad = []
        if "BatchEvalPython" in p:
            bad.append("row-python-udf")
        if "CartesianProduct" in p:
            bad.append("cartesian")
        if bad:
            offenders[name] = bad
    Q.drain_cache()
    spark.catalog.clearCache()
    assert not offenders, offenders
