"""Pure-Python mirror of the reference's core semantics.

This module is the *specification* layer: small, dependency-free functions
that reproduce, byte-for-byte, the behaviors of /root/reference that the
Spark operators must match. Tests use these as oracles; the corpus
generator uses the tokenizer so goldens are consistent by construction.

Reference citations (all into /root/reference/):
- whole-word split regex: splitner/utils/generate_bio.py:86 (escaped
  variant ``+\\-=``; the unescaped variant at :32 accidentally creates the
  char range ``+``..``=`` which swallows digits — we adopt the escaped one
  and note the discrepancy here).
- BIO span assembly with ``can_continue``: splitner/analysis.py:77-91.
- BIOES (QA-mode) span assembly: splitner/evaluator.py:59-116 and
  splitner/evaluator_qa.py:39-101 (O=0,B=1,I=2,E=3,S=4 per
  splitner/dataset_qa.py:137-150).
- micro/macro P/R/F1 epsilons: splitner/analysis.py:54-56 (1e-7) and
  splitner/evaluator.py:171,181 (1e-9).
- pattern featurization: splitner/dataset.py:192-335.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

# --- tokenization -----------------------------------------------------------

# splitner/utils/generate_bio.py:86 — punctuation chars split as their own
# tokens; whitespace is a separator and dropped.
PUNCT_CHARS = ",;.!?:'\"/|_@#$%^&*~`+-=<>()[]{}"
_PUNCT_CLASS = "[,;.!?:'\"/|_@#$%^&*~`+\\-=<>()\\[\\]{}]"
SPLIT_RE = re.compile("(" + _PUNCT_CLASS + r"|\s+)")
# single regex equivalent used by the Spark-side regexp_extract_all:
TOKEN_RE_JAVA = (
    "[,;.!?:'\"/|_@#$%^&*~`+\\-=<>()\\[\\]{}]"
    "|[^,;.!?:'\"/|_@#$%^&*~`+\\-=<>()\\[\\]{}\\s]+"
)
_TOKEN_RE = re.compile(TOKEN_RE_JAVA)


def tokenize(text: str) -> list[str]:
    """Whole-word split, punctuation as standalone tokens.

    Mirrors ``re.split(...)`` + strip + drop-empty of generate_bio.py:86-93.
    """
    out = []
    for tok in SPLIT_RE.split(text):
        tok = tok.strip()
        if tok:
            out.append(tok)
    return out


def tokenize_fast(text: str) -> list[str]:
    """findall equivalent of :func:`tokenize` (proven equal in tests)."""
    return _TOKEN_RE.findall(text)


def segment(tokens: list[str]) -> list[list[str]]:
    """Split a token stream into sentences at ``.`` tokens (inclusive).

    Mirrors the sentence-splitting loop of generate_bio.py:72-83 (split at
    '.' with the period kept as the sentence's last token; trailing tokens
    without a closing period form the final sentence).
    """
    sents: list[list[str]] = []
    start = 0
    for i, tok in enumerate(tokens):
        if tok == ".":
            sents.append(tokens[start : i + 1])
            start = i + 1
    if start < len(tokens):
        sents.append(tokens[start:])
    return sents


# --- text extraction (the byte-identity invariant) --------------------------

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes | None, text: str | None) -> str:
    """Canonical text per url — MUST be byte-identical across runs.

    Rule: if ``text`` is present it is trusted (FIXTURES.md F1 note: the
    pipeline must ignore ``html`` when ``text`` is present); otherwise the
    html is utf-8 decoded and tags stripped. Then NFC-normalize, collapse
    all whitespace runs to a single ASCII space, strip.
    """
    if text is not None and text != "":
        raw = text
    elif html is not None:
        raw = _TAG_RE.sub(" ", html.decode("utf-8", errors="replace"))
    else:
        raw = ""
    raw = unicodedata.normalize("NFC", raw)
    return _WS_RE.sub(" ", raw).strip()


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# --- span assembly -----------------------------------------------------------


def get_spans_bio(tags: list[str]) -> list[tuple[str, int, int]]:
    """BIO span assembly with the ``can_continue`` guard.

    Mirrors splitner/analysis.py:77-91: ``B-X`` opens a span; ``I-X``
    extends only if the type matches the last opened span AND no break
    occurred since (``can_continue``); anything else closes.
    Returns (tag, start, end) with inclusive token indices.
    """
    spans: list[list] = []
    can_continue = False
    for index, tag in enumerate(tags):
        if tag.startswith("B-"):
            spans.append([tag[2:], index, index])
            can_continue = True
        elif (
            tag.startswith("I-")
            and spans
            and spans[-1][0] == tag[2:]
            and can_continue
        ):
            spans[-1][2] = index
        else:
            can_continue = False
    return [(t, s, e) for t, s, e in spans]


def get_spans_bioes(labels: list[str]) -> list[tuple[int, int]]:
    """Untyped BIOES span assembly (QA detect mode).

    Mirrors splitner/evaluator.py:59-96 specialized to a single untyped
    entity class with labels in {O,B,I,E,S} (splitner/dataset_qa.py:137-150):
    B opens, I extends (bio behavior retained: evaluator updates ``end``
    only for scheme "bio"; for BIOE the E closes), S is a singleton,
    a non-continuation breaks.

    We adopt the BIOE reading used by the detect pipeline: span = B (I*) E?
    where E terminates; an unterminated B..I run still yields a span ending
    at the last contiguous I (matching ``prev_span.end`` updates under
    scheme "bio") — tests pin these cases.
    """
    spans: list[tuple[int, int]] = []
    start = None
    last = None
    for i, lab in enumerate(labels):
        if lab == "B":
            if start is not None:
                spans.append((start, last))
            start, last = i, i
        elif lab == "S":
            if start is not None:
                spans.append((start, last))
                start, last = None, None
            spans.append((i, i))
        elif lab == "I" and start is not None and last == i - 1:
            last = i
        elif lab == "E" and start is not None and last == i - 1:
            spans.append((start, i))
            start, last = None, None
        else:
            if start is not None:
                spans.append((start, last))
            start, last = None, None
    if start is not None:
        spans.append((start, last))
    return spans


# --- metrics -----------------------------------------------------------------


def prf1(tp: int, fp: int, fn: int, eps: float = 1e-7) -> tuple[float, float, float]:
    """P/R/F1 with the reference's epsilon placement (analysis.py:54-56)."""
    p = tp * 1.0 / (tp + fp + eps)
    r = tp * 1.0 / (tp + fn + eps)
    f1 = 2.0 * p * r / (p + r + eps)
    return p, r, f1


def micro_macro(per_tag: dict[str, tuple[int, int, int]], eps: float = 1e-7):
    """Micro (summed counts) + macro (mean of per-tag F1) — analysis.py:50-74.

    ``per_tag``: tag -> (tp, fp, fn). Macro divides by (n_tags + eps).
    """
    ttp = sum(v[0] for v in per_tag.values())
    tfp = sum(v[1] for v in per_tag.values())
    tfn = sum(v[2] for v in per_tag.values())
    micro = prf1(ttp, tfp, tfn, eps)
    f1_sum = 0.0
    for tag in per_tag:
        f1_sum += prf1(*per_tag[tag], eps)[2]
    macro = f1_sum / (len(per_tag) + eps)
    return micro, macro


# --- pattern featurization (splitner/dataset.py:192-335) ---------------------


def make_pattern_type0(text: str) -> str:
    out = []
    for c in text:
        if "a" <= c <= "z":
            out.append("l")
        elif "A" <= c <= "Z":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)


def make_pattern_type2(text: str) -> str:
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    out = []
    for c in text:
        if "a" <= c <= "z":
            out.append("l")
        elif "A" <= c <= "Z":
            out.append("u")
        elif "0" <= c <= "9":
            out.append("d")
        else:
            out.append(c)
    return "".join(out)


def make_pattern_type1(text: str) -> str:
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    if re.fullmatch(r"[a-z]+", text):
        return "L"
    if re.fullmatch(r"[A-Z]+", text):
        return "U"
    if re.fullmatch(r"[A-Z][a-z]+", text):
        return "F"
    if re.fullmatch(r"[A-Za-z]+", text):
        return "M"
    return make_pattern_type0(text)


def make_pattern_type3(text: str) -> str:
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    if re.fullmatch(r"[a-z]+", text):
        return "L"
    if re.fullmatch(r"[A-Z]+", text):
        return "U"
    if re.fullmatch(r"[A-Z][a-z]+", text):
        return "F"
    if re.fullmatch(r"[A-Za-z]+", text):
        return "M"
    return make_pattern_type2(text)


def make_pattern_type4(text: str) -> str:
    """Run-length word shape, e.g. ``Acme2`` -> ``U1L3D1`` (dataset.py:276-313)."""
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    pattern_text = ""
    pattern = ""
    prev_pattern = ""
    cnt = 0
    is_symbol = False
    for c in text:
        is_symbol = False
        if "a" <= c <= "z":
            pattern = "L"
        elif "A" <= c <= "Z":
            pattern = "U"
        elif "0" <= c <= "9":
            pattern = "D"
        else:
            pattern = c
            is_symbol = True
        if prev_pattern == "":
            prev_pattern = pattern
        if is_symbol:
            pattern_text += pattern
            prev_pattern = pattern
            cnt = 0
        elif prev_pattern != pattern:
            pattern_text += prev_pattern + str(cnt)
            prev_pattern = pattern
            cnt = 0
        cnt += 1
    if text and not is_symbol:
        pattern_text += pattern + str(cnt)
    return pattern_text


def get_word_type(text: str) -> str:
    """10-class word shape (dataset.py:316-335)."""
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    if re.fullmatch(r"[a-z]+", text):
        return "L"
    if re.fullmatch(r"[A-Z]+", text):
        return "U"
    if re.fullmatch(r"[A-Z][a-z]+", text):
        return "F"
    if re.fullmatch(r"[A-Za-z]+", text):
        return "M"
    if re.fullmatch(r"[0-9]+", text):
        return "D"
    if re.fullmatch(r"[^A-Za-z0-9]+", text):
        return "P"
    if re.fullmatch(r"[A-Za-z0-9]+", text):
        return "A"
    return "B"


def normalize_surface(surface: str) -> str:
    """Normalization used for alias-dictionary linking: lowercase, strip
    punctuation tokens, collapse whitespace. Deterministic and unicode-safe
    (NFC). Engine-side twin lives in ops/link.py.
    """
    s = unicodedata.normalize("NFC", surface).lower()
    s = "".join(" " if c in PUNCT_CHARS else c for c in s)
    return _WS_RE.sub(" ", s).strip()
