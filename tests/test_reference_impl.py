"""Pure-Python spec layer: tokenizer, span assembly, metrics, patterns.

These pin the semantics lifted from /root/reference (file:line cites in
split_ner_spark/reference_impl.py docstrings).
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from split_ner_spark import reference_impl as R


def reference_split(text):
    # literal transcription of generate_bio.py:86-93 (escaped variant)
    toks = re.split("([,;.!?:'\"/|_@#$%^&*~`+\\-=<>()\\[\\]{}]|\\s+)", text)
    out = []
    for t in toks:
        t = t.strip()
        if t:
            out.append(t)
    return out


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenize_matches_reference_split(text):
    assert R.tokenize(text) == reference_split(text)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenize_fast_matches_tokenize(text):
    assert R.tokenize_fast(text) == R.tokenize(text)


def test_tokenize_examples():
    assert R.tokenize("Acme Corp, in Zürich!") == ["Acme", "Corp", ",", "in", "Zürich", "!"]
    assert R.tokenize("a-b") == ["a", "-", "b"]
    assert R.tokenize("  ") == []


def test_segment():
    toks = ["a", "b", ".", "c", ".", "d"]
    assert R.segment(toks) == [["a", "b", "."], ["c", "."], ["d"]]
    assert R.segment([]) == []
    assert R.segment(["x"]) == [["x"]]
    assert R.segment(["."]) == [["."]]


def test_extract_text_rules():
    assert R.extract_text(None, " a \t b\nc ") == "a b c"
    assert R.extract_text(b"<p>hi <b>there</b></p>", None) == "hi there"
    assert R.extract_text(b"<p>ignored</p>", "kept") == "kept"
    assert R.extract_text(None, None) == ""


# FIXTURES.md F8: BIO edge cases (semantics analysis.py:77-91)
def test_bio_span_assembly_edge_cases():
    g = R.get_spans_bio
    assert g(["I-x"]) == []  # orphan I at start
    assert g(["B-x", "I-y"]) == [("x", 0, 0)]  # type switch breaks
    assert g(["B-x", "B-x"]) == [("x", 0, 0), ("x", 1, 1)]  # adjacent mentions
    # can_continue: I-x after a break does NOT extend
    assert g(["B-x", "O", "I-x"]) == [("x", 0, 0)]
    assert g(["B-x", "I-x", "I-x"]) == [("x", 0, 2)]
    # I-x after B-y break then B-x: fresh span
    assert g(["B-y", "B-x", "I-x"]) == [("y", 0, 0), ("x", 1, 2)]


def test_bioes_span_assembly_edge_cases():
    g = R.get_spans_bioes
    assert g(["S"]) == [(0, 0)]
    assert g(["B", "E"]) == [(0, 1)]
    assert g(["B", "I", "E"]) == [(0, 2)]
    assert g(["B", "I"]) == [(0, 1)]  # unterminated run still closes
    assert g(["E"]) == []  # orphan E
    assert g(["I"]) == []  # orphan I
    assert g(["B", "B", "E"]) == [(0, 0), (1, 2)]
    assert g(["B", "S", "E"]) == [(0, 0), (1, 1)]  # S closes open span; E orphaned
    assert g(["O", "B", "O"]) == [(1, 1)]


def test_metric_epsilons():
    # hand-computed with the reference's epsilon placement (analysis.py:54-56)
    p, r, f1 = R.prf1(8, 2, 4, eps=1e-7)
    assert abs(p - 8 / (10 + 1e-7)) < 1e-15
    assert abs(r - 8 / (12 + 1e-7)) < 1e-15
    assert abs(f1 - 2 * p * r / (p + r + 1e-7)) < 1e-15
    (mp, mr, mf1), macro = R.micro_macro({"a": (1, 0, 0), "b": (0, 1, 1)}, eps=1e-7)
    assert mp == 1 / (2 + 1e-7)
    f_a = R.prf1(1, 0, 0)[2]
    f_b = R.prf1(0, 1, 1)[2]
    assert abs(macro - (f_a + f_b) / (2 + 1e-7)) < 1e-15
    # zero-division safety: all-zero counts
    assert R.prf1(0, 0, 0) == (0.0, 0.0, 0.0)


def test_patterns():
    # dataset.py:206-335 semantics
    assert R.make_pattern_type0("Ab3,") == "ul3,"
    assert R.make_pattern_type2("Ab3,") == "uld,"
    assert R.make_pattern_type1("abc") == "L"
    assert R.make_pattern_type1("ABC") == "U"
    assert R.make_pattern_type1("Abc") == "F"
    assert R.make_pattern_type1("aBc") == "M"
    assert R.make_pattern_type1("a1") == "l1"  # type0 fallback keeps digits verbatim
    assert R.make_pattern_type3("a1") == "ld"  # type2 fallback encodes digits as d
    assert R.make_pattern_type4("Acme2") == "U1L3D1"
    # reference quirk (dataset.py:276-313): a symbol does NOT flush the
    # pending letter run, so the U1 for "X" is lost — pinned as-is.
    assert R.make_pattern_type4("X-2") == "--1D1"
    assert R.get_word_type("abc") == "L"
    assert R.get_word_type("ABC") == "U"
    assert R.get_word_type("Abc") == "F"
    assert R.get_word_type("aBc") == "M"
    assert R.get_word_type("123") == "D"
    assert R.get_word_type(",.") == "P"
    assert R.get_word_type("a1") == "A"
    assert R.get_word_type("a,1") == "B"
    assert R.get_word_type("[CLS]") == "C"


def test_normalize_surface():
    assert R.normalize_surface("Acme Corp.") == "acme corp"
    assert R.normalize_surface("ACME-Corp") == "acme corp"
    assert R.normalize_surface("  Müller  ") == "müller"
