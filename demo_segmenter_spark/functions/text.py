"""Text-analysis column expressions for the LLM-data-pipeline layer
(SURVEY.md §2 Layer C). Built-ins only — tokenization, hashing and
fingerprinting all stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword list; the fixture corpus is a synthetic word soup with a
# 31-token vocabulary (measured, SURVEY.md §1.2), so these do occur.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# BPE-ish lexer: words, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the fixture is single-space separated)."""
    return F.split(text, " ")


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def char_shingle_min_md5(text: Column, k: int = 8) -> Column:
    """Rolling-hash document fingerprint: min md5 over all k-char
    shingles. md5 is the cross-engine-stable hash (Spark == DuckDB);
    the min over hex strings is a deterministic winnowing-style
    fingerprint. Pure codegen'd expression (sequence → transform →
    array_min), no UDF.
    """
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length(text) - {k - 1}, 1)),"
        f" i -> md5(substring(text, i, {k}))))"
    )
