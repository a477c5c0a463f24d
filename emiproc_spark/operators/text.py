"""Text analysis for large-scale training-data pipelines.

Beyond-reference operators (SURVEY.md §7.2 M7): tokenization, shingles,
quality scoring, language-ID heuristic, document fingerprinting.  All
hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small English stopword set for the heuristic scorers (deterministic,
# shared with oracle SQL via STOPWORDS_SQL)
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]
STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split — the canonical
    tokenizer shared with the DuckDB oracle)."""
    return F.split(text, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings.

    Built by zipping n shifted slices of the token array — one pass, no
    per-index ``element_at`` (which would re-evaluate ``toks`` per
    element when it is an unmaterialized expression like ``split``).
    IMPORTANT: pass a *materialized column* (select the split into a
    column first); see ``operators.dedup.doc_shingles``.
    """
    win = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, win)
    for k in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, k + 1, win), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))


# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the subset both
# Java regex and RE2 support — no lookahead): contraction suffixes, then
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_REGEX = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization (the GPT-2 split pattern without merges):
    the token-count estimator for LLM training budgets.  Pure
    ``regexp_extract_all`` — JVM-side, no UDF."""
    return F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token count, char count, mean word
    length, stopword ratio — the length/punct/stopword heuristics of
    web-scale corpus filtering."""
    t = tokens(F.col(text_col))
    return docs.withColumns(
        {
            "n_tokens": F.size(t),
            "n_chars_m": F.length(text_col),
            "mean_word_len": F.length(text_col) / F.size(t),
            "stopword_ratio": stopword_count(t) / F.size(t),
        }
    )


def lang_id_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-overlap score (fraction of tokens
    in the English stopword set).  A real model plugs in the same shape —
    per-language marker-token sets scored in one pass."""
    t = tokens(F.col(text_col))
    return docs.withColumn("en_score", stopword_count(t) / F.size(t)).withColumn(
        "is_en", (F.col("en_score") > 0.05).cast("int")
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, space-joined) token stream."""
    t = tokens(F.lower(F.trim(F.col(text_col))))
    return docs.withColumn("fp", F.md5(F.concat_ws(" ", t)))
