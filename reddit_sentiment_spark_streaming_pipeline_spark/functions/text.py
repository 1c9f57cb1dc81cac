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
    """(generator, keep-filter) pair for exploding an EXPENSIVE array expr.

    Plain explode lets InferFiltersFromGenerate synthesize
    ``size(arr) > 0 AND isnotnull(arr)`` and push it toward the scan,
    where both conjuncts re-evaluate the full array expression per input
    row — for interpreted higher-order operands (split + filter,
    transform chains, regexp_extract_all) that triples the pipeline's
    dominant CPU inside the parallelism-bound scan stage (measured 19x
    wall on the byte-4-gram payload pipeline at 10x data).

    The engine's own sessions exclude that rule (session.py), so the
    current strategy is a PLAIN explode — no outer-generate null branch,
    no extra Filter exec (an explode_outer + isnotnull variant measured
    ~5-10% slower on token pipelines) — and the returned keep-filter is
    a constant the optimizer folds away. In a foreign session (the
    driver's default-config oracle runs at sf0.01) the inferred filter
    comes back and merely costs extra scan CPU; results are identical.
    Call sites keep the (generator, filter) shape so the strategy can be
    swapped in one place.

    Usage::

        gen, keep = explode_clean(tokens("text"), "word")
        tok = docs.select("doc_id", gen).filter(keep)
    """
    col = F.col(arr) if isinstance(arr, str) else arr
    return F.explode(col).alias(alias), F.lit(True)


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
