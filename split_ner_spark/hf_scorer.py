"""HFScorer — the real-checkpoint adapter for the Scorer slot.

SURVEY §7.4 fixes the scorer contract so that swapping the deterministic
surrogate for real SplitNER checkpoints changes ONLY the UDF payload,
never the Spark plan:

    detect_labels(list[list[str]]) -> list[list[str]]   # BIOES per token
    classify_surfaces(list[str])   -> list[str]         # type per mention

This module implements that contract against HuggingFace checkpoints,
mirroring the reference end to end:

- model/tokenizer load: ``AutoConfig/AutoModel/AutoTokenizer
  .from_pretrained(model_path)`` exactly as the reference executor
  (/root/reference/splitner/main_qa.py:41-50), lazily and ONCE PER
  PYTHON WORKER (module-level singleton keyed by path — the mapInPandas
  boundary calls ``detect_labels`` per Arrow batch, and the model must
  not reload per batch);
- QA context: ``[CLS] <query> [SEP] <sentence subwords> [SEP]`` with the
  detect query (question4), token_type 0 for the query segment and 1 for
  the sentence (splitner/dataset_qa.py:309-399; specials
  splitner/dataset.py:372-391);
- subword alignment: fast-tokenizer ``word_ids()`` gives the
  first-subword ``is_head`` flags (the BertToken.is_head of
  splitner/utils/general.py:39-52);
- batch collation: pad to max-length-in-batch, not global max
  (splitner/dataset.py:621);
- prediction mapping: argmax over the label dim (splitner/model.py:291;
  splitner/model_span.py:58), then first-subword (type1) mapping back to
  words (splitner/main_qa.py:110-160), QA tag order O=0,B=1,I=2,E=3,S=4
  (splitner/dataset_qa.py:137-150);
- **F2 char/pattern id encoding** (splitner/dataset.py:472-505):
  :func:`encode_char_ids` / :func:`encode_pattern_ids` are numpy twins of
  ``get_char_ids``/``get_pattern_ids`` — the feature tensors the CharCNN /
  pattern-LSTM variants consume; they are exercised by hermetic unit
  tests (no torch needed) and fed to the model when
  ``use_char_cnn``/``use_pattern`` is configured.

All heavy imports (torch, transformers) happen lazily inside methods and
are import-guarded, so this module imports cleanly in the hermetic test
container; tests assert the Spark PLAN is identical under
DeterministicScorer and HFScorer (only the UDF payload differs).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np

from .reference_impl import make_pattern_type1

# QA detect-mode label order — splitner/dataset_qa.py:137-150
QA_TAGS = ["O", "B", "I", "E", "S"]
DETECT_QUERY = "Extract important entity spans from the following text ."

_WORKER_MODELS: dict = {}  # (path, task) -> (tokenizer, model); per-worker


# --- F2: char / pattern id encoding (splitner/dataset.py:472-505) -------------


def encode_char_ids(
    batch_text: list[list[str]], max_len: int, vocab: list[str]
) -> np.ndarray:
    """numpy twin of ``NerQADataset.get_char_ids`` (dataset.py:473-487):
    char → vocab index + 1 (0 = pad), per-word padded to the batch's max
    word length (min 3 — the reference's CNN kernel guard), per-sentence
    padded to ``max_len`` words. int64, shape (B, max_len, max_word)."""
    max_word_len = max(
        (len(w) for sent in batch_text for w in sent), default=3
    )
    max_word_len = max(max_word_len, 3)
    idx = {c: i + 1 for i, c in enumerate(vocab)}
    out = np.zeros((len(batch_text), max_len, max_word_len), dtype=np.int64)
    for s, sent in enumerate(batch_text):
        for t, word in enumerate(sent[:max_len]):
            ids = [idx[c] for c in word if c in idx]
            out[s, t, : len(ids)] = ids
    return out


def encode_pattern_ids(
    batch_text: list[list[str]], max_len: int, pattern_vocab: list[str]
) -> np.ndarray:
    """numpy twin of ``get_pattern_ids`` (dataset.py:489-505): the word's
    pattern string → vocab index, OOV → len(vocab), pad 0. The pattern
    strings themselves come from the reference featurizers
    (reference_impl.make_pattern_type*). int64, shape (B, max_len)."""
    idx = {p: i for i, p in enumerate(pattern_vocab)}
    oov = len(pattern_vocab)
    out = np.zeros((len(batch_text), max_len), dtype=np.int64)
    for s, sent in enumerate(batch_text):
        for t, word in enumerate(sent[:max_len]):
            out[s, t] = idx.get(word, oov)
    return out


def pattern_features(tokens: list[str]) -> list[str]:
    """Word → pattern string (the featurization the id-encoding consumes);
    type1 is the reference's default pattern_type (additional_args.py)."""
    return [make_pattern_type1(t) for t in tokens]


# --- head mapping + label-order derivation (hermetically tested) -------------


def map_first_subword_predictions(
    word_ids: list[int | None],
    seq_ids: list[int | None],
    pred_row,
    n_words: int,
    tags: list[str] = QA_TAGS,
) -> list[str]:
    """First-subword (type1) prediction mapping — the pure logic of the
    reference's subword→word decode (splitner/main_qa.py:110-160 via
    BertToken.is_head, splitner/utils/general.py:39-52), extracted so it
    is testable WITHOUT torch: ``word_ids``/``seq_ids`` are what a fast
    tokenizer's pair encoding returns (None on specials/pads; sequence 0
    = query, 1 = sentence), ``pred_row`` the per-position argmax indices.
    Only the FIRST subword of each sentence-segment word contributes; a
    word truncated away keeps 'O'."""
    labels = ["O"] * n_words
    seen: set[int] = set()
    for pos, (wid, sid) in enumerate(zip(word_ids, seq_ids)):
        if sid != 1 or wid is None or wid in seen:
            continue
        seen.add(wid)
        if wid < n_words:
            labels[wid] = tags[int(pred_row[pos])]
    return labels


def derive_label_order(config, fallback: list[str]) -> list[str]:
    """Label order from the checkpoint's ``config.id2label`` when it is
    meaningful, else ``fallback``.

    A checkpoint not trained by the reference code very often carries its
    own id2label (e.g. token classifiers with O/B/I/E/S in a different
    index order); silently decoding with the reference's hardcoded
    QA_TAGS order would emit wrong tags. transformers' DEFAULT map is
    ``LABEL_0..LABEL_{n-1}`` — that placeholder (or a missing map) is the
    only case where the reference order (splitner/dataset_qa.py:137-150)
    is assumed."""
    id2label = dict(getattr(config, "id2label", None) or {})
    if not id2label:
        return fallback
    try:
        labels = [str(id2label[k]) for k in sorted(id2label, key=int)]
    except (KeyError, TypeError, ValueError):
        return fallback
    if all(lab.startswith("LABEL_") for lab in labels):
        return fallback
    if labels != list(fallback):
        # the checkpoint's vocabulary wins, but NOT silently: a checkpoint
        # typed PER/ORG where the caller configured person/organization
        # would otherwise shift every downstream entity_type string with
        # no signal to the operator
        import warnings

        warnings.warn(
            "checkpoint id2label overrides the configured label order: "
            f"checkpoint={labels} configured={list(fallback)}",
            stacklevel=2,
        )
    return labels


def transformers_available() -> bool:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


class HFScorer:
    """Real-model scorer. Construction is cheap and import-free; the
    checkpoint loads lazily on first use, once per python worker.

    ``detect_model_path`` — span-detection checkpoint (BIOES token
    classifier, num_labels=5); ``classify_model_path`` — span
    classification checkpoint (sequence classifier over entity types,
    ``type_names`` maps label index → type string)."""

    def __init__(
        self,
        detect_model_path: str,
        classify_model_path: str | None = None,
        type_names: list[str] | None = None,
        max_seq_len: int = 256,
        batch_size: int = 16,
        nsp_model_path: str | None = None,
    ):
        self.detect_model_path = detect_model_path
        self.classify_model_path = classify_model_path
        self.type_names = type_names or []
        self.max_seq_len = max_seq_len
        self.batch_size = batch_size
        self.nsp_model_path = nsp_model_path

    # -- lazy per-worker load (main_qa.py:41-50 twin) --
    def _load(self, path: str, task: str):
        key = (path, task)
        if key not in _WORKER_MODELS:
            import torch
            from transformers import (
                AutoConfig,
                AutoModelForNextSentencePrediction,
                AutoModelForSequenceClassification,
                AutoModelForTokenClassification,
                AutoTokenizer,
            )

            config = AutoConfig.from_pretrained(path)
            tokenizer = AutoTokenizer.from_pretrained(path, use_fast=True)
            cls = {
                "detect": AutoModelForTokenClassification,
                "classify": AutoModelForSequenceClassification,
                "nsp": AutoModelForNextSentencePrediction,
            }[task]
            model = cls.from_pretrained(path, config=config)
            model.eval()
            torch.set_grad_enabled(False)
            fallback = QA_TAGS if task == "detect" else self.type_names
            labels = derive_label_order(config, fallback)
            _WORKER_MODELS[key] = (tokenizer, model, labels)
        return _WORKER_MODELS[key]

    # -- detect: BIOES labels per word (UDF #1 payload) --
    def detect_labels(self, sentences: Iterable[list[str]]) -> list[list[str]]:
        tokenizer, model, tags = self._load(self.detect_model_path, "detect")
        sents = [list(s) for s in sentences]
        out: list[list[str]] = []
        for lo in range(0, len(sents), self.batch_size):
            chunk = sents[lo : lo + self.batch_size]
            # [CLS] query [SEP] sentence [SEP] — dataset_qa.py:309-399;
            # the tokenizer pair-encoding reproduces the segment layout
            # (token_type 0 = query, 1 = sentence)
            enc = tokenizer(
                [DETECT_QUERY.split(" ")] * len(chunk),
                chunk,
                is_split_into_words=True,
                truncation="only_second",
                max_length=self.max_seq_len,
                padding=True,  # pad to batch max (dataset.py:621)
                return_tensors="pt",
            )
            logits = model(**enc).logits  # (B, T, 5)
            pred = logits.argmax(dim=2)  # model.py:291
            for b, sent in enumerate(chunk):
                out.append(
                    map_first_subword_predictions(
                        enc.word_ids(batch_index=b),
                        enc.sequence_ids(b),
                        pred[b],
                        len(sent),
                        tags,
                    )
                )
        return out

    # -- classify: one type per mention surface (UDF #2 payload) --
    def classify_surfaces(self, surfaces: list[str]) -> list[str]:
        if self.classify_model_path is None:
            raise ValueError("classify_model_path not configured")
        tokenizer, model, types = self._load(self.classify_model_path, "classify")
        out: list[str] = []
        for lo in range(0, len(surfaces), self.batch_size):
            chunk = list(surfaces[lo : lo + self.batch_size])
            # "What is {mention} ?" — dataset_span.py:82-87 query form
            enc = tokenizer(
                [f"What is {s} ?" for s in chunk],
                truncation=True,
                max_length=self.max_seq_len,
                padding=True,
                return_tensors="pt",
            )
            pred = model(**enc).logits.argmax(dim=1)  # model_span.py:58
            for p in pred:
                i = int(p)
                out.append(types[i] if i < len(types) else str(i))
        return out

    # -- NSP: candidate previous-sentence scoring (C2 slot) --
    def nsp_scores(self, pairs: list[tuple[str, str]]) -> list[float]:
        """Raw "is-next" logit for (candidate_prev, sentence) pairs — the
        real-model slot for the reference's helper-sentence retrieval,
        which scores candidates with BertForNextSentencePrediction and
        keeps the argmax of the RAW class-0 logit
        (splitner/utils/next_sent_prediction.py:32-50). Returning that
        logit (not softmax P(next), which is monotone in l0−l1, not l0)
        means ranking candidates by this score reproduces the reference's
        best-candidate choice exactly. The engine's default retrieval
        (ops/simsearch.cosine_topk over embeddings) is a documented
        stand-in for this scorer; swap it in by ranking candidates with
        this method instead of cosine. ``nsp_model_path`` defaults to the
        detect checkpoint's path."""
        path = self.nsp_model_path or self.detect_model_path
        tokenizer, model, _ = self._load(path, "nsp")

        out: list[float] = []
        for lo in range(0, len(pairs), self.batch_size):
            chunk = pairs[lo : lo + self.batch_size]
            enc = tokenizer(
                [a for a, _ in chunk],
                [b for _, b in chunk],
                truncation=True,
                max_length=self.max_seq_len,
                padding=True,
                return_tensors="pt",
            )
            # label 0 = "is next" in BertForNextSentencePrediction; the
            # reference ranks by this logit directly, no softmax
            logits = model(**enc).logits[:, 0]
            out.extend(float(v) for v in logits)
        return out
