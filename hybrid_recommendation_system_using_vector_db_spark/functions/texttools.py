"""Text column expressions: tokenization, n-grams, quality signals.

Everything here is built-in Spark SQL functions (codegen'd, vectorizable);
no Python UDFs. Tokenization is deliberately simple and *portable* — the
same semantics are expressible in the DuckDB oracle — and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed English-ish stopword list used by quality scoring.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "this", "that", "be",
]


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empty strings dropped."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Built from ``sequence`` + ``slice`` — stays JVM-side. Empty when the
    document has fewer than ``n`` tokens.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_count(toks: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def punct_count(text: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
