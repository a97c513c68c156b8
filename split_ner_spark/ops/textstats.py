"""Text-analysis operators for the training-data pipeline over ``documents``.

Language-ID (stopword n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (bottom-k shingle sketch).

Reference analog: the corpus statistics utilities of the reference
(/root/reference/splitner/utils/dataset_stats.py:9-46 — mention density,
sentence length, alphanumeric ratios) and the pattern featurization
(splitner/dataset.py:192-335), generalized to a web-corpus curation
setting. Everything here is Catalyst-native (no Python UDFs): the whole
stage stays inside WholeStageCodegen and scales linearly with input —
exactly the shape a 100 TB curation pass needs (narrow, shuffle-free,
column-pruned to ``doc_id, text``).

Every operator has an exact ANSI-SQL twin (same expression tree) used as
the DuckDB oracle in ``__spark_entry__.py``; the constants below are the
single source of truth for both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokens / BPE-ish word-piece tokens. RE2- and Java-compatible.
TOKEN_WS_RE = r"\S+"
TOKEN_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
# punctuation class shared with reference_impl.PUNCT_CHARS (escaped for both
# Java regex and RE2 inside a character class).
PUNCT_RE = r"[,;.!?:'\"/|_@#$%^&*~`+\-=<>()\[\]{}]"

STOPWORDS = {
    "en": ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "oder", "ein", "eine", "ist", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "ou", "un", "une", "est", "de", "dans"],
    "es": ["el", "la", "los", "y", "o", "un", "una", "es", "de", "en"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie-break order


def _sql_list(words: list[str]) -> str:
    return ", ".join("'" + w + "'" for w in words)


def ws_tokens(col: str = "text") -> Column:
    return F.regexp_extract_all(F.col(col), F.lit(TOKEN_WS_RE), F.lit(0))


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace tokens, BPE-ish pieces, chars.

    ``pieces_per_token`` is the fertility ratio a tokenizer-budget planner
    uses when sizing a training mix.
    """
    toks = ws_tokens()
    bpe = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_BPE_RE), F.lit(0))
    n_tok = F.size(toks)
    n_bpe = F.size(bpe)
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens_ws"),
        n_bpe.cast("long").alias("n_tokens_bpe"),
        # NULL fertility for token-less docs (ANSI x/0 would throw)
        F.when(n_tok > 0, n_bpe.cast("double") / n_tok.cast("double"))
        .alias("pieces_per_token"),
    )


def token_stats_sql(doc_table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '{TOKEN_WS_RE}')) AS n_tokens_ws,
           len(regexp_extract_all(text, '{TOKEN_BPE_RE}')) AS n_tokens_bpe,
           CASE WHEN len(regexp_extract_all(text, '{TOKEN_WS_RE}')) > 0
                THEN CAST(len(regexp_extract_all(text, '{TOKEN_BPE_RE}')) AS DOUBLE)
                      / CAST(len(regexp_extract_all(text, '{TOKEN_WS_RE}')) AS DOUBLE)
           END AS pieces_per_token
    FROM {doc_table}
    """


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1] from length/punct/stopword ratios.

    The formula is arbitrary-but-fixed; what matters at 100 TB is that it
    is one codegen'd projection (no UDF, no shuffle) so a full-corpus
    quality pass is scan-bound.
    """
    toks = ws_tokens()
    n_tok = F.size(toks).cast("double")
    n_chars = F.length("text").cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))
    ).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col("text"), PUNCT_RE, ""))
    ).cast("double")
    # raw doubles, no rounding: identical expression trees on identical
    # inputs are bitwise-equal across Spark and DuckDB, whereas round(x, 6)
    # diverges on decimal ties (Spark rounds the shortest decimal repr,
    # DuckDB the raw binary).
    # explicit zero for token-less / empty docs: under ANSI mode a bare
    # x/0 THROWS and kills the whole job — and a 100 TB crawl always
    # contains empty pages (found by scripts/fuzz_oracle.py)
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.least(F.lit(1.0), n_tok / F.lit(64.0)) * 0.5
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return documents.select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def quality_scores_sql(doc_table: str = "documents") -> str:
    en = _sql_list(STOPWORDS["en"])
    punct_sql = PUNCT_RE.replace("'", "''")
    toks = f"regexp_extract_all(text, '{TOKEN_WS_RE}')"
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    n_chars = "CAST(length(text) AS DOUBLE)"
    stop_hits = f"CAST(len(list_filter({toks}, t -> t IN ({en}))) AS DOUBLE)"
    n_punct = (
        f"({n_chars} - CAST(length(regexp_replace(text, '{punct_sql}', '', 'g')) AS DOUBLE))"
    )
    stop_ratio = (
        f"(CASE WHEN {n_tok} > 0 THEN {stop_hits} / {n_tok} ELSE 0.0 END)"
    )
    punct_ratio = (
        f"(CASE WHEN {n_chars} > 0 THEN {n_punct} / {n_chars} ELSE 0.0 END)"
    )
    return f"""
    SELECT doc_id,
           {stop_ratio} AS stopword_ratio,
           {punct_ratio} AS punct_ratio,
           least(1.0, {n_tok} / 64.0) * 0.5
                 + (1.0 - least({punct_ratio} * 10.0, 1.0)) * 0.2
                 + least({stop_ratio} * 5.0, 1.0) * 0.3 AS quality
    FROM {doc_table}
    """


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit language ID: argmax over per-language hit counts.

    Ties break on language code ascending; zero hits → 'und'. This is the
    classic n-gram/stopword heuristic (CLD-style) reduced to a pure
    Catalyst projection — per-language hit counting over the token array,
    then a fold to pick the argmax.
    """
    toks = ws_tokens()

    def hits_for(words: list[str]) -> Column:
        # NB: a 2-param lambda would make F.filter pass the array index as
        # the second argument — keep the closure single-arg.
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    hit_cols = {lang: hits_for(words) for lang, words in STOPWORDS.items()}
    best = None
    for lang in LANGS:  # ascending order ⇒ strict > keeps earlier lang on tie
        h = hit_cols[lang]
        if best is None:
            best = F.struct(h.alias("hits"), F.lit(lang).alias("lang"))
        else:
            best = F.when(
                h > best["hits"],
                F.struct(h.alias("hits"), F.lit(lang).alias("lang")),
            ).otherwise(best)
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return documents.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        pred.alias("lang_pred"),
        best["hits"].cast("int").alias("stopword_hits"),
    )


def lang_id_sql(doc_table: str = "documents") -> str:
    toks = f"regexp_extract_all(text, '{TOKEN_WS_RE}')"
    hits = {
        lang: f"len(list_filter({toks}, t -> t IN ({_sql_list(words)})))"
        for lang, words in STOPWORDS.items()
    }
    # same left-to-right strict-> fold as the Spark side
    expr_hits, expr_lang = hits[LANGS[0]], f"'{LANGS[0]}'"
    for lang in LANGS[1:]:
        h = hits[lang]
        expr_lang = f"CASE WHEN {h} > {expr_hits} THEN '{lang}' ELSE {expr_lang} END"
        expr_hits = f"CASE WHEN {h} > {expr_hits} THEN {h} ELSE {expr_hits} END"
    return f"""
    SELECT doc_id,
           lang AS lang_declared,
           CASE WHEN {expr_hits} > 0 THEN {expr_lang} ELSE 'und' END AS lang_pred,
           CAST({expr_hits} AS INT) AS stopword_hits
    FROM {doc_table}
    """


def doc_fingerprints(documents: DataFrame, k: int = 4, bottom: int = 4) -> DataFrame:
    """Bottom-k shingle fingerprint (winnowing-style document sketch).

    md5 each k-token shingle, keep the ``bottom`` lexicographically
    smallest hashes, fingerprint = md5 of their concatenation. Two docs
    share a fingerprint iff their smallest shingle hashes agree — a
    near-dup prefilter that needs one narrow pass and no shuffle.
    """
    toks = ws_tokens()
    n = F.size(toks)
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    sketch = F.slice(F.array_sort(F.array_distinct(shingle_hashes)), 1, bottom)
    # token-less docs have NO fingerprint (NULL) — same contract as
    # dedup.shingle_arrays: they sit outside the shingle universe rather
    # than all sharing one md5('') sketch (fuzz_oracle finding)
    return documents.select(
        "doc_id",
        F.when(n > 0, F.md5(F.concat_ws("|", sketch))).alias("fingerprint"),
        F.when(n > 0, F.element_at(sketch, 1)).alias("min_shingle_hash"),
    )


def doc_fingerprints_sql(doc_table: str = "documents", k: int = 4, bottom: int = 4) -> str:
    toks = f"regexp_extract_all(text, '{TOKEN_WS_RE}')"
    n = f"len({toks})"
    hashes = (
        f"list_transform(range(1, greatest({n} - {k - 1}, 1) + 1), "
        f"i -> md5(array_to_string({toks}[i:i+{k - 1}], ' ')))"
    )
    sketch = f"list_sort(list_distinct({hashes}))[1:{bottom}]"
    # token-less docs: the empty-slice -> NULL propagation chain yields
    # NULL fingerprint/min hash, matching doc_fingerprints' explicit NULL
    return f"""
    SELECT doc_id,
           md5(array_to_string({sketch}, '|')) AS fingerprint,
           {sketch}[1] AS min_shingle_hash
    FROM {doc_table}
    """
