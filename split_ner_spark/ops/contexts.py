"""Q1/Q2/Q3 — QA-context construction operators.

Reference semantics (/root/reference/splitner/):
- **Q1 detect context** (dataset_qa.py:309-399, query text :157-189):
  ONE context per sentence — ``[CLS] <query> [SEP] <sentence> [SEP]``
  with the fixed detect query (question4: "Extract important entity
  spans from the following text .").
- **Q2 per-type contexts — the Single(QA) baseline** (dataset_qa.py:
  191-307, driver process_sentence :401-406): the cross product
  sentence × entity-type — one context per (sentence, tag), query built
  from the tag's English name, labels binarized per tag. This is the
  construction whose cost the SplitNER paper's core claim AVOIDS
  (Table 3: Single(QA) inference ≈5× slower because it scores
  N_types contexts per sentence instead of 1).
- **Q3 classify context** (dataset_span.py:82-130): one context per
  detected mention — query "What is {mention} ?", sentence truncated so
  query+sentence fit max_seq_len (:111).

Spark mapping (SURVEY §2 rows Q1-Q3): pure array expressions — a context
is a row, so construction is a projection; Q2's cross product is
``crossJoin(broadcast(tags))`` (the tag dim is tiny). Cardinalities:
Q1 = |sentences|, Q2 = |sentences| × |tags|, Q3 = |mentions| — computing
them side by side reproduces the paper's context-volume comparison
computationally (see queries.kg_qa_contexts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# question4 of dataset_qa.py:157-189 — the detect-mode query
DETECT_QUERY = "Extract important entity spans from the following text ."
DETECT_QUERY_TOKENS = DETECT_QUERY.split(" ")


def _context_tokens(query_tokens: Column, sent_tokens: Column) -> Column:
    """[CLS] query [SEP] sentence [SEP] — dataset_qa.py:324-340 layout."""
    return F.concat(
        F.array(F.lit("[CLS]")),
        query_tokens,
        F.array(F.lit("[SEP]")),
        sent_tokens,
        F.array(F.lit("[SEP]")),
    )


def detect_contexts(sentences: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Q1: one detect context per sentence (the SplitNER-mode volume)."""
    q = F.array(*[F.lit(t) for t in DETECT_QUERY_TOKENS])
    ctx = _context_tokens(q, F.col(tokens_col))
    return sentences.withColumn("context_tokens", ctx).withColumn(
        "n_context_tokens", F.size("context_tokens")
    )


def tag_query_tokens(tag_name_col: Column) -> Column:
    """Per-type query — mirrors the tag-name question family of
    dataset_qa.py:157-189 ("What is the <tag name> mentioned in the
    text ?" shape)."""
    return F.concat(
        F.array(F.lit("What"), F.lit("is"), F.lit("the")),
        F.split(tag_name_col, " "),
        F.array(F.lit("mentioned"), F.lit("in"), F.lit("the"),
                F.lit("text"), F.lit("?")),
    )


def per_type_contexts(
    sentences: DataFrame,
    tag_names: DataFrame,
    tokens_col: str = "tokens",
    tags_col: str | None = None,
    helper_sentence: bool = False,
    train: bool = False,
    max_seq_len: int | None = None,
) -> DataFrame:
    """Q2 (Single(QA) baseline): one context per (sentence × entity type).

    ``tag_names(entity_type, tag_name)`` is broadcast — the cross join
    multiplies cardinality by N_types, which is exactly the cost the
    split design avoids. When ``tags_col`` (BIO tags per token) is given,
    labels are binarized per type (token=1 iff its tag's type matches —
    dataset_qa.py:252-296 binarization).

    ``helper_sentence`` reproduces the reference's
    ``add_qa_helper_sentence`` arm (dataset_qa.py:212-230): a copy of the
    sentence is placed INSIDE the query segment (token_type 0), before
    the first [SEP]. At inference (``train=False``) the helper is the
    full sentence; at train time a token is kept iff it is O or belongs
    to the target type, and dropped otherwise. (The reference's
    ``tag_to_text_mapping`` substitution branch at :218-219 is
    unreachable for single-tag tokens — the ``tag in token_tags`` test
    at :217 already matches B-/I- of the target type — so the reachable
    semantics are what is mirrored here.) ``max_seq_len`` applies the
    reference's tail truncation (:301-303: clip to max_seq_len-1, then
    append the final [SEP])."""
    q = tag_query_tokens(F.col("tag_name"))
    if helper_sentence:
        if train and tags_col is not None:
            kept = F.filter(
                F.arrays_zip(F.col(tokens_col), F.col(tags_col)),
                lambda s: (s[tags_col] == "O")
                | (F.substring(s[tags_col], 3, 1000) == F.col("entity_type")),
            )
            helper = F.transform(kept, lambda s: s[tokens_col])
        else:
            helper = F.col(tokens_col)
        q = F.concat(q, helper)
    if max_seq_len is None:
        ctx = _context_tokens(q, F.col(tokens_col))
    else:
        # reference layout with tail truncation: everything before the
        # final [SEP] is clipped to max_seq_len-1, then [SEP] appended
        body = F.concat(
            F.array(F.lit("[CLS]")), q, F.array(F.lit("[SEP]")),
            F.col(tokens_col),
        )
        ctx = F.concat(
            F.slice(body, 1, max_seq_len - 1), F.array(F.lit("[SEP]"))
        )
    out = sentences.crossJoin(F.broadcast(tag_names)).withColumn(
        "context_tokens", ctx
    ).withColumn("n_context_tokens", F.size("context_tokens"))
    if tags_col is not None:
        binarized = F.transform(
            F.col(tags_col),
            lambda t: F.when(
                F.substring(t, 3, 1000) == F.col("entity_type"), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        out = out.withColumn("binary_labels", binarized)
    return out


def classify_contexts(
    mentions: DataFrame,
    tokens_col: str = "tokens",
    surface_col: str = "surface",
    max_seq_len: int = 128,
) -> DataFrame:
    """Q3: one context per detected mention — query "What is {mention} ?"
    (dataset_span.py:82-87), sentence truncated to fit (:111)."""
    q = F.concat(
        F.array(F.lit("What"), F.lit("is")),
        F.split(F.col(surface_col), " "),
        F.array(F.lit("?")),
    )
    # room left for the sentence: max_len minus query and 3 specials
    budget = F.lit(max_seq_len - 3) - F.size(q)
    sent = F.slice(F.col(tokens_col), 1, F.greatest(budget, F.lit(1)))
    ctx = _context_tokens(q, sent)
    return mentions.withColumn("context_tokens", ctx).withColumn(
        "n_context_tokens", F.size("context_tokens")
    )
