"""Text primitives shared by TF-IDF, dedup and text-analysis operators.

Tokenization contract (must stay identical between the Spark expressions
and the DuckDB oracle SQL): lowercase, split on runs of whitespace, drop
empty tokens, drop STOPWORDS.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Classic public-domain English stopword subset (Lucene-style). Fixed and
# vendored so engine and oracle share one list (the reference relies on
# MLlib StopWordsRemover defaults, reddit_consumer.py:186-187).
STOPWORDS: list[str] = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
]


def tokens(text_col: str | Column) -> Column:
    """array<string> of lowercase whitespace tokens (empties removed)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(col), r"\s+")
    return F.filter(toks, lambda w: w != "")


def content_tokens(text_col: str | Column) -> Column:
    """tokens() minus stopwords."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.filter(tokens(text_col), lambda w: ~F.array_contains(stop, w))


def explode_clean(arr: str | Column, alias: str) -> tuple[Column, Column]:
    """(generator, post-filter) pair for exploding an EXPENSIVE array expr.

    Plain explode lets InferFiltersFromGenerate synthesize
    ``size(arr) > 0 AND isnotnull(arr)`` and push it toward the scan,
    where both conjuncts re-evaluate the full array expression per input
    row — for interpreted higher-order operands (split + filter,
    transform chains, regexp_extract_all) that triples the pipeline's
    dominant CPU inside the parallelism-bound scan stage (measured 19x
    wall on the byte-4-gram payload pipeline). explode_outer infers
    nothing; the returned null filter, applied AFTER the generate,
    restores plain-explode semantics by dropping the single null row an
    empty or null array emits.

    Usage::

        gen, keep = explode_clean(tokens("text"), "word")
        tok = docs.select("doc_id", gen).filter(keep)
    """
    col = F.col(arr) if isinstance(arr, str) else arr
    return F.explode_outer(col).alias(alias), F.col(alias).isNotNull()


def stopwords_sql_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


# DuckDB fragment: one row per (doc_id, word) content token (duplicates kept).
TOKENS_SQL = f"""
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS word
        FROM documents
"""

CONTENT_TOKENS_SQL = f"""
        SELECT * FROM ({TOKENS_SQL})
        WHERE word <> '' AND word NOT IN ({stopwords_sql_list()})
"""
