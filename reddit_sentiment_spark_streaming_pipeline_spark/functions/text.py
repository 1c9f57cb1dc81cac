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
