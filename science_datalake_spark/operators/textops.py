"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (BASELINE.json north star; reference analogues:
is_readable_text / detect_language / clean_text, convert_openalex.py:120-147,
convert_fulltext.py:67-87).

All are native column expressions (codegen-friendly, zero Python overhead at
100 TB). The reference's langdetect UDF is replaced by a stopword-ratio
heuristic — at scale the UDF route is a pandas_udf over mapInPandas, but
the heuristic covers the common filter use case JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English function-word list for the n-gram/stopword heuristic.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (ARRAY<STRING>)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word-piece boundaries at non-alphanumerics +
    every 4 chars of long words (a cheap, deterministic proxy for
    tokenizer-based counts used to budget LLM context)."""
    words = tokens(text)
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are function words — the language-ID signal."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters (quality signal,
    reference is_readable_text ≥50% alpha check)."""
    return F.length(F.regexp_replace(text, "[^A-Za-z]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite document-quality score clamped to [0,1]: alpha ratio,
    stopword presence (saturating), and a length term (≥30 tokens
    saturates)."""
    length_term = F.least(token_count(text) / F.lit(30.0), F.lit(1.0))
    raw = 0.4 * alpha_ratio(text) + 0.3 * stopword_ratio(text) * 5.0 + 0.3 * length_term
    return F.round(F.least(raw, F.lit(1.0)), 4)


def predict_lang(text: Column, threshold: float = 0.10) -> Column:
    """Stopword-ratio language ID: 'en' when function-word density clears
    the threshold, else 'other'."""
    return F.when(stopword_ratio(text) >= threshold, "en").otherwise("other")


def fingerprint(text: Column, prefix_len: int = 200) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased first ``prefix_len`` chars — the cheap exact-dup content key
    (rolling-hash analogue that is engine-portable)."""
    normalized = F.regexp_replace(F.lower(F.substring(text, 1, prefix_len)), r"\s+", " ")
    return F.md5(normalized)
