"""Text-analysis column functions for training-data pipelines: token
counting, quality scoring, language ID, fingerprinting. All built-in
``pyspark.sql.functions`` expressions (JVM-side, whole-stage codegen) —
deliberately no UDFs, and each has an exact ANSI-SQL twin for the DuckDB
oracle (kept adjacent in __spark_entry__.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
    words = F.split(F.lower(col), r"\s+")
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
    'und' (undetermined) when nothing matches."""
    words = F.split(F.lower(col), r"\s+")
    scores = []
    for lang, sw_list in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in sw_list])
        scores.append((lang, F.size(F.filter(words, lambda w: F.array_contains(sw, w)))))
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reverse order => earlier languages win ties (deterministic)
    for lang, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out
