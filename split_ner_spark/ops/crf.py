"""M4 — CRF/Viterbi decode variant of the span-detection scorer.

Reference semantics (/root/reference/splitner/model_crf.py:79-166): the
CRF model variant computes per-token emission log-probabilities
(``log_softmax(classifier(...))``, :153 area) and decodes the best label
SEQUENCE with ``torchcrf.CRF.decode`` — Viterbi over learned transition
scores — instead of per-token argmax. SURVEY §2 places this inside UDF #1
when ``model_mode="crf"``: the decode is per-sentence, so it lives in the
Arrow batch, and the Spark plan is identical to the argmax variant.

The rebuild ships:
- :func:`viterbi_decode` — exact max-sum Viterbi (numpy, no torch): the
  same recurrence torchcrf implements (score = start[y0] + Σ emit +
  Σ trans + end[yT]), unit-tested against brute-force enumeration over
  all label sequences;
- a BIOES *grammar* transition matrix (invalid transitions = -inf):
  B→{I,E}, I→{I,E}, {O,E,S}→{O,B,S}, sequences must start in {O,B,S} and
  end in {O,E,S} — the structural constraint a trained CRF learns;
- :class:`CrfScorer` — the surrogate emission model (same word-shape
  signal as DeterministicScorer) + Viterbi decode, satisfying the Scorer
  contract, so ``detect_spans(sents, scorer=CrfScorer())`` runs the CRF
  variant through the unchanged UDF slot. With a real checkpoint, the
  HFScorer forward would produce the emissions and this module still does
  the decode (torchcrf not required at inference).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np

BIOES = ["O", "B", "I", "E", "S"]
_O, _B, _I, _E, _S = range(5)
NEG = -1e9


def bioes_transitions() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(trans[L,L], start[L], end[L]) grammar scores: 0 allowed, -inf not.

    Mirrors the label semantics of splitner/dataset_qa.py:137-150
    (O=0,B=1,I=2,E=3,S=4): a mention is B (I)* E or S; O runs freely."""
    t = np.full((5, 5), NEG)
    for frm in (_O, _E, _S):  # outside a mention
        for to in (_O, _B, _S):
            t[frm, to] = 0.0
    for frm in (_B, _I):  # inside a mention
        for to in (_I, _E):
            t[frm, to] = 0.0
    start = np.array([0.0, 0.0, NEG, NEG, 0.0])
    end = np.array([0.0, NEG, NEG, 0.0, 0.0])
    # deterministic tie-break standing in for learned transition weights:
    # a run of entity-shaped tokens has several equal-score grammatical
    # decodes (B I E vs S B E vs S S S); a trained CRF prefers the long
    # mention, so entering S costs a hair more than continuing a mention
    t[:, _S] -= 0.01
    start[_S] -= 0.01
    return t, start, end


def viterbi_decode(
    emissions: np.ndarray,
    trans: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
) -> list[int]:
    """Exact best-path decode (max-sum). emissions: (T, L) log-scores.

    The recurrence of torchcrf's CRF.decode (model_crf.py:153 call site):
    v[0] = start + emit[0]; v[t] = max_prev(v[t-1] + trans) + emit[t];
    best = argmax(v[T-1] + end), backtracked."""
    T, L = emissions.shape
    v = start + emissions[0]
    back = np.zeros((T, L), dtype=np.int64)
    for t in range(1, T):
        scores = v[:, None] + trans  # (prev, cur)
        back[t] = np.argmax(scores, axis=0)
        v = scores[back[t], np.arange(L)] + emissions[t]
    last = int(np.argmax(v + end))
    path = [last]
    for t in range(T - 1, 0, -1):
        last = int(back[t, last])
        path.append(last)
    path.reverse()
    return path


class CrfScorer:
    """Span-detection scorer, CRF flavor: word-shape emissions + BIOES
    grammar Viterbi. Same Scorer contract (and therefore the same Spark
    plan) as DeterministicScorer — only the decode differs: the grammar
    FORCES well-formed BIOES (argmax decoding can emit I without B; CRF
    decoding cannot), which is the reference's reason for the CRF variant.

    ``margin`` is the emission log-odds of the shape signal — entity-shaped
    tokens (capitalized initial) prefer mention states, others prefer O.
    """

    def __init__(self, margin: float = 2.0):
        self.margin = margin
        self._t, self._s, self._e = bioes_transitions()

    def _emissions(self, toks: list[str]) -> np.ndarray:
        from .detect import _is_entity_token

        em = np.zeros((len(toks), 5))
        for i, tok in enumerate(toks):
            if _is_entity_token(tok):
                em[i, [_B, _I, _E, _S]] = self.margin
            else:
                em[i, _O] = self.margin
        return em

    def detect_labels(self, sentences: Iterable[list[str]]) -> list[list[str]]:
        out = []
        for toks in sentences:
            toks = list(toks)
            if not toks:
                out.append([])
                continue
            path = viterbi_decode(self._emissions(toks), self._t, self._s, self._e)
            out.append([BIOES[i] for i in path])
        return out
