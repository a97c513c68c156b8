"""Fused python pass: corpus-gen → extract → segment → detect → assemble →
classify in ONE ``mapInPandas`` stage.

Why this exists: chained ``mapInPandas`` stages each get their OWN python
worker per task, so a 3-deep python chain at ``local[32]`` runs ~96
concurrent python processes — measured 3.3x slow-down vs ``local[8]``
(oversubscription + a JVM↔python Arrow boundary between every pair).
Fusing the per-row python logic into one UDF restores one worker per task
and one Arrow crossing — the python-side analog of whole-stage codegen,
and the reason SURVEY §2.10 fixes the UDF surface to as few boundaries as
possible.

Semantics are IDENTICAL to the staged operators: the fused body calls the
same pure-python twins (reference_impl.extract_text/ tokenize_fast/
segment/ get_spans_bioes, detect.DeterministicScorer, classify_surface)
that the staged Spark operators are pinned against; a test asserts
fused == staged row-for-row.

At a real 100 TB deployment the same fusion applies unchanged: the UDF
reads ``pages`` rows instead of generating them (swap ``gen`` for the
Iceberg scan) and the two transformer forwards replace the surrogate
scorer inside the single worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import corpus
from ..reference_impl import extract_text, segment, tokenize_fast
from .classify import classify_surface
from .detect import DeterministicScorer

MENTIONS_TS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("detect_score", T.DoubleType()),
        T.StructField("entity_type", T.StringType()),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("detect_score", T.DoubleType()),
        T.StructField("entity_type", T.StringType()),
    ]
)


def _mentions_for_page(page: dict, scorer: DeterministicScorer) -> list[tuple]:
    if page["lang"] != "en":
        return []
    # round 6: sentences come straight from the generator when present
    # (corpus._gen_page(mentions_only=True) — pinned equal to
    # segment∘tokenize_fast∘extract_text of the page text); the text path
    # stays for real-page sources (mentions_from_pages).
    sents = page.get("sents")
    if sents is None:
        sents = segment(tokenize_fast(extract_text(None, page["text"])))
    out = []
    url = page["url"]
    # detect_runs == get_spans_bioes(detect_labels(...)) + non-O count
    # (pinned by tests/test_corpus_fastpath.py); a sentence with no span
    # emits nothing, so its score is never observable.
    _runs = scorer.detect_runs
    for sid, sent in enumerate(sents):
        spans, nflag = _runs(sent)
        if not spans:
            continue
        score = round(1.0 - 1.0 / (2.0 + nflag), 6)
        for s, e in spans:
            surface = sent[s] if s == e else " ".join(sent[s : e + 1])
            out.append(
                (url, sid, s, e, surface, score, classify_surface(surface))
            )
    return out


def fused_mentions(
    spark: SparkSession,
    n_pages: int,
    seed: int = corpus.SEED,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic corpus → typed mentions in one python stage.

    Row-identical to ``classify_mentions(assemble_untyped(detect_spans(
    segment_pages(corpus.pages(gen)))))`` (pinned by tests)."""
    registry = corpus.build_registry(seed)
    if partitions is None:
        # 4x overdecomposition: with exactly one task-wave the slowest
        # task sets the wall (measured ~20% straggler tail); 4 waves of
        # smaller tasks smooth it — the standard 2-4x-cores rule.
        partitions = max(8, spark.sparkContext.defaultParallelism * 4)
    scorer = DeterministicScorer()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for pid in pdf["id"].tolist():
                page = corpus._gen_page(pid, registry, seed, mentions_only=True)
                rows.extend(_mentions_for_page(page, scorer))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "sent_id", "start", "end", "surface",
                    "detect_score", "entity_type",
                ],
            )

    ids = spark.range(0, n_pages, 1, partitions)
    return ids.mapInPandas(run, schema=MENTIONS_SCHEMA)


def mentions_from_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, text, lang, ...) → typed mentions (+ warc_ts),
    one fused python stage. Stream-safe (stateless per batch): this is the
    operator the incremental/streaming path uses, and the shape a real
    deployment runs over an Iceberg pages scan."""
    scorer = DeterministicScorer()
    src = pages.select("url", "warc_ts", "text", "lang")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for url, ts, text, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["text"], pdf["lang"]
            ):
                page = {"url": url, "text": text, "lang": lang}
                for m in _mentions_for_page(page, scorer):
                    rows.append((m[0], ts) + m[1:])
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "sent_id", "start", "end", "surface",
                    "detect_score", "entity_type",
                ],
            )

    return src.mapInPandas(run, schema=MENTIONS_TS_SCHEMA)
