"""Text-analysis column functions for training-data pipelines: token
counting, quality scoring, language ID, fingerprinting. All built-in
``pyspark.sql.functions`` expressions (JVM-side, whole-stage codegen) —
deliberately no UDFs, and each has an exact ANSI-SQL twin for the DuckDB
oracle (kept adjacent in __spark_entry__.py)."""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F


def ascii_lower(col: Column) -> Column:
    """ASCII-only lowercase via ``translate`` — used instead of ``lower()``
    in hot paths because Spark 4's collation-aware lowercase initializes
    ICU4J on first task use (measured 40-80s one-time stall per JVM in this
    environment: page-fault storm loading the memory-mapped ICU data).
    Matching ASCII stopword lists is unaffected: A-Z map identically, and
    no non-ASCII character can lowercase into an ASCII stopword."""
    return F.translate(col, string.ascii_uppercase, string.ascii_lowercase)

# whitespace tokens (word counting) and a BPE-ish subword regex
WORD_RE = r"[^\s]+"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny deterministic stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "los", "las", "es", "que", "una", "por", "con", "para"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.regexp_extract_all(col, F.lit(WORD_RE), 0))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish subword count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def punct_ratio(col: Column) -> Column:
    non_space = F.length(F.regexp_replace(col, r"\s", ""))
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.when(non_space > 0, punct.cast("double") / non_space.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    words = F.regexp_extract_all(col, F.lit(WORD_RE), 0)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) > 0, total.cast("double") / F.size(words).cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    words = F.split(ascii_lower(col), r"\s+")
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(words) > 0, hits.cast("double") / F.size(words).cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    plausible mean word length. Deterministic, monotone pieces only."""
    n = token_count(col)
    len_score = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 2.0, F.lit(1.0))
    mwl = mean_word_length(col)
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score + punct_score + mwl_score) / F.lit(3.0)


def language_id(col: Column) -> Column:
    """n-gram/stopword-heuristic language ID over STOPWORDS languages;
    'und' (undetermined) when nothing matches. Earlier languages win ties
    (array_position returns the FIRST maximal score). One score array so
    each per-language score subtree is evaluated once, instead of the
    nested-CaseWhen form that re-derives `best` plus its own score in
    every branch."""
    words = F.split(ascii_lower(col), r"\s+")
    langs = list(STOPWORDS)
    scores = F.array(*[
        F.size(F.filter(words, lambda w: F.array_contains(
            F.array(*[F.lit(s) for s in STOPWORDS[lang]]), w)))
        for lang in langs
    ])
    best = F.array_max(scores)
    lang_arr = F.array(*[F.lit(lg) for lg in langs])
    return F.when(
        best > 0, F.element_at(lang_arr, F.array_position(scores, best).cast("int"))
    ).otherwise(F.lit("und"))
