"""Subword (wordpiece) machinery: Q4 tokenization, Q5 label expansion,
A1 first-subword mapping — the reference's BERT-token plumbing rebuilt on
array expressions.

Reference semantics:
- Q4: HF wordpiece tokenization with ``is_head`` on the first piece
  (/root/reference/splitner/dataset.py:372-391; BertToken
  splitner/utils/general.py:39-52). Real checkpoints need the pinned HF
  tokenizer inside the inference UDF; for the hermetic engine we use a
  deterministic surrogate (fixed-width 4-char pieces, ``##`` continuation
  marks) with the same structure: (orig_offset, piece_idx, piece, is_head).
- Q5: word-level BIOES labels expand to pieces as first-piece-keeps-label,
  continuation pieces become I (splitner/dataset_qa.py:245);
- A1: back-mapping takes the FIRST subword's prediction per original
  token, B/S → ``B-<type>``, I/E → ``I-<type>``, else O, with first-wins
  dedup on sentence text (splitner/main_qa.py:110-160).

All Catalyst array expressions (no UDF): a sentence fits in a row, so
expansion and mapping are per-row transforms — shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PIECE_W = 4  # surrogate wordpiece width


def pieces_col(tok: Column) -> Column:
    """token → array of pieces: fixed-width chunks, '##' marks
    continuations. Deterministic surrogate of a wordpiece tokenizer."""
    n_pieces = F.ceil(F.length(tok) / F.lit(PIECE_W)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_pieces - 1, F.lit(0))),
        lambda i: F.when(i == 0, tok.substr(F.lit(1), F.lit(PIECE_W))).otherwise(
            F.concat(F.lit("##"), tok.substr(i * PIECE_W + 1, F.lit(PIECE_W)))
        ),
    )


def explode_subwords(sentences: DataFrame) -> DataFrame:
    """sentences(url, sent_id, tokens) → subtokens(url, sent_id,
    orig_offset, piece_idx, piece, is_head) — the BertToken table."""
    per_tok = sentences.select(
        "url",
        "sent_id",
        F.posexplode("tokens").alias("orig_offset", "token"),
    )
    return per_tok.select(
        "url",
        "sent_id",
        "orig_offset",
        F.posexplode(pieces_col(F.col("token"))).alias("piece_idx", "piece"),
    ).withColumn("is_head", F.col("piece_idx") == 0)


def expand_labels_to_pieces(detected: DataFrame) -> DataFrame:
    """Q5: word-level BIOES labels → per-piece labels.

    First piece keeps the word label; continuation pieces become I when
    inside a mention (B/I/S/E word), O otherwise (dataset_qa.py:245,
    E-continuations per :260-269)."""
    tok_pieces = F.transform(
        F.col("tokens"), lambda t: F.size(pieces_col(t))
    )
    piece_labels = F.flatten(
        F.zip_with(
            F.col("labels"),
            tok_pieces,
            lambda lab, n: F.concat(
                F.array(lab),
                F.array_repeat(
                    F.when(lab == "O", F.lit("O")).otherwise(F.lit("I")), n - 1
                ),
            ),
        )
    )
    head_flags = F.flatten(
        F.transform(
            tok_pieces,
            lambda n: F.concat(
                F.array(F.lit(True)),
                F.array_repeat(F.lit(False), n - 1),
            ),
        )
    )
    # orig_offset per piece: repeat index i, n_i times
    offsets = F.flatten(
        F.zip_with(
            F.sequence(F.lit(0), F.size("tokens") - 1),
            tok_pieces,
            lambda i, n: F.transform(F.sequence(F.lit(1), n), lambda _: i),
        )
    )
    return detected.withColumn("piece_labels", piece_labels).withColumn(
        "piece_heads", head_flags
    ).withColumn("piece_offsets", offsets)


def _bio_of(lab: Column) -> Column:
    return (
        F.when(lab.isin("B", "S"), F.lit("B-ENTITY"))
        .when(lab.isin("I", "E"), F.lit("I-ENTITY"))
        .otherwise(F.lit("O"))
    )


def map_pieces_to_tokens(expanded: DataFrame, mapping: str = "type1") -> DataFrame:
    """A1/A2: subword predictions → original-token BIO tags; duplicate
    sentences resolve first-wins by sentence text (row_number over
    sent_text, main_qa.py:120-127).

    ``mapping="type1"`` (reference default, additional_args.py:45-46;
    main_qa.py:110-160): take the FIRST subword's prediction per token,
    B/S→B-ENTITY, I/E→I-ENTITY, else O.

    ``mapping="type2"`` (consistency variant, main_qa.py:162-214): the
    head piece maps as in type1, but the token is reset to O when any of
    its CONTINUATION pieces predicts a non-continuation label (not I/E) —
    "if the output for bert sub-tokens is inconsistent, then map to
    NONE_TAG" (main_qa.py:162; the reference marks its own implementation
    "needs proof-reading" at :164 — we implement the stated intent).
    Implemented as a per-row array group (pieces of token i =
    piece_labels where piece_offsets == i), shuffle-free."""
    if mapping not in ("type1", "type2"):
        raise ValueError(f"mapping must be type1|type2, got {mapping!r}")
    if mapping == "type1":
        heads = F.filter(
            F.zip_with(
                F.col("piece_labels"),
                F.col("piece_heads"),
                lambda lab, h: F.when(h, lab),
            ),
            lambda x: x.isNotNull(),
        )
        token_tags = F.transform(heads, _bio_of)
    else:
        trip = F.zip_with(
            F.zip_with(
                F.col("piece_labels"),
                F.col("piece_offsets"),
                lambda lab, off: F.struct(lab.alias("lab"), off.alias("off")),
            ),
            F.col("piece_heads"),
            lambda p, h: F.struct(
                p["lab"].alias("lab"), p["off"].alias("off"), h.alias("head")
            ),
        )

        def tok_tag(i: Column) -> Column:
            mine = F.filter(trip, lambda p: p["off"] == i)
            head_lab = F.element_at(
                F.transform(
                    F.filter(mine, lambda p: p["head"]), lambda p: p["lab"]
                ),
                1,
            )
            bad_cont = F.exists(
                mine,
                lambda p: (~p["head"]) & ~p["lab"].isin("I", "E"),
            )
            # inconsistent continuation prediction → O (main_qa.py:162 rule)
            return F.when(bad_cont, F.lit("O")).otherwise(_bio_of(head_lab))

        # size guard: sequence(0, -1) DESCENDS in Spark (known gotcha)
        token_tags = F.when(
            F.size("tokens") < 1,
            F.array().cast("array<string>"),
        ).otherwise(
            F.transform(F.sequence(F.lit(0), F.size("tokens") - 1), tok_tag)
        )
    out = expanded.withColumn("token_tags", token_tags).withColumn(
        "sent_text", F.array_join("tokens", " ")
    )
    w = Window.partitionBy("sent_text").orderBy("url", "sent_id")
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
