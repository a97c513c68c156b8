"""Round-6 fused-pipeline fast paths are pure recomputation-skips.

Three invariants pin them (no Spark needed):

1. ``_gen_page(mentions_only=True)`` returns per-sentence token lists
   exactly equal to ``segment(tokenize_fast(extract_text(None, text)))``
   of the SAME page generated in full mode, with the same url/lang —
   i.e. the fused path skips re-deriving structure the generator built.
2. ``DeterministicScorer.detect_runs`` equals
   ``get_spans_bioes(detect_labels(...))`` plus the non-O label count,
   on adversarial token lists (empty tokens, unicode, case edges).
3. ``_mentions_for_page`` over the mentions_only page equals the original
   text-path derivation (extract → tokenize → segment → detect_labels →
   get_spans_bioes → classify) over the full page, row for row.
"""

from __future__ import annotations

import random

from split_ner_spark import corpus
from split_ner_spark.ops.classify import classify_surface
from split_ner_spark.ops.detect import DeterministicScorer
from split_ner_spark.ops.fused import _mentions_for_page
from split_ner_spark.reference_impl import (
    extract_text,
    get_spans_bioes,
    segment,
    tokenize_fast,
)

N_PAGES = 3000  # spans all langs, FN/FP noise, fuzzy surfaces, multi-sent


def test_mentions_only_page_matches_text_derivation():
    registry = corpus.build_registry(corpus.SEED)
    n_en = 0
    for pid in range(N_PAGES):
        full = corpus._gen_page(pid, registry, corpus.SEED)
        fast = corpus._gen_page(pid, registry, corpus.SEED, mentions_only=True)
        assert fast["lang"] == full["lang"]
        if full["lang"] != "en":
            continue
        n_en += 1
        assert fast["url"] == full["url"]
        want = segment(tokenize_fast(extract_text(None, full["text"])))
        assert fast["sents"] == want, pid
    assert n_en > N_PAGES // 2


def test_detect_runs_equals_bioes_assembly():
    scorer = DeterministicScorer()
    rnd = random.Random(7)
    alpha = [
        "Foo", "bar", "X1", "zz", "", "Über", "Ωmega", ".", "A", "b",
        "MiXed", "HTTP", "é", "É", "Zorblax",
    ]
    for _ in range(5000):
        toks = [rnd.choice(alpha) for _ in range(rnd.randint(0, 12))]
        labels = scorer.detect_labels([toks])[0]
        assert scorer.detect_runs(toks) == (
            get_spans_bioes(labels),
            sum(1 for x in labels if x != "O"),
        ), toks


def test_fused_rows_match_text_path():
    registry = corpus.build_registry(corpus.SEED)
    scorer = DeterministicScorer()

    def text_path_rows(page: dict) -> list[tuple]:
        if page["lang"] != "en":
            return []
        sents = segment(tokenize_fast(extract_text(None, page["text"])))
        all_labels = scorer.detect_labels(sents)
        out = []
        for sid, (sent, labels) in enumerate(zip(sents, all_labels)):
            score = round(
                1.0 - 1.0 / (2.0 + sum(1 for x in labels if x != "O")), 6
            )
            for s, e in get_spans_bioes(labels):
                surface = " ".join(sent[s : e + 1])
                out.append(
                    (page["url"], sid, s, e, surface, score,
                     classify_surface(surface))
                )
        return out

    n_rows = 0
    for pid in range(N_PAGES):
        want = text_path_rows(corpus._gen_page(pid, registry, corpus.SEED))
        got = _mentions_for_page(
            corpus._gen_page(pid, registry, corpus.SEED, mentions_only=True),
            scorer,
        )
        assert got == want, pid
        n_rows += len(want)
    assert n_rows > 1000
