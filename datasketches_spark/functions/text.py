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
    # isin over the literal list (not array_contains over an array literal):
    # with spark.sql.optimizer.inSetConversionThreshold <= 10 (session.py)
    # the 10-word membership test compiles to one InSet hash probe per word
    # instead of a 10-element array scan
    words = F.split(ascii_lower(col), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS[lang])))
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


_ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


def language_id(col: Column) -> Column:
    """n-gram/stopword-heuristic language ID over STOPWORDS languages;
    'und' (undetermined) when nothing matches. Earlier languages win ties
    (the CaseWhen picks the FIRST language whose score equals the max —
    same rule as the oracle SQL and the previous array_position form).

    Shape chosen from measurement (guide §1/§4: per-task work): the old
    form ran FOUR filter passes over the words array, each scanning a
    10-element array literal per word and materializing a filtered array
    (~10.5 s noop-sink over 50k docs at local[32]). This form makes ONE
    filter pass with a 40-word InSet hash probe (inSetConversionThreshold
    is lowered to 9 in session.py so the 10/40-element isin compiles to a
    hash set, not a linear In chain), keeping only the rare stopword hits,
    then scores the 4 languages in a single aggregate over that short
    array (struct accumulator — one pass, no per-language intermediate
    arrays). Measured 0.95 s on the same input — ~11x. Results are
    bit-identical (pinned against the old form on 50k docs, 0 mismatches,
    and by the unchanged DuckDB oracle)."""
    words = F.split(ascii_lower(col), r"\s+")
    langs = list(STOPWORDS)
    sw_only = F.filter(words, lambda w: w.isin(_ALL_STOPWORDS))
    zero = F.struct(*[F.lit(0).alias(f"c{i}") for i in range(len(langs))])

    def _merge(acc, w):
        return F.struct(*[
            (acc[f"c{i}"] + F.when(w.isin(STOPWORDS[lg]), 1).otherwise(0)).alias(f"c{i}")
            for i, lg in enumerate(langs)])

    counts = F.aggregate(sw_only, zero, _merge)
    scores = [counts[f"c{i}"] for i in range(len(langs))]
    best = F.greatest(*scores)
    expr = F.lit("und")
    for lg, s in reversed(list(zip(langs, scores))):
        expr = F.when(s == best, F.lit(lg)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))
