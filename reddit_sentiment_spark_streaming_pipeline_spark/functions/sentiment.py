"""Lexicon-based sentiment scoring (the reference's VADER UDF, U1).

Parity: reddit_consumer.py:90-99 wraps VADER's ``polarity_scores(...)['compound']``
(null/error → 0.0). VADER's compound score is a lexicon valence sum passed
through the normalization ``s / sqrt(s² + α)`` with α=15 — that public
formula (Hutto & Gilbert 2014) is what we implement over a small frozen
lexicon vendored below, so scores are deterministic, distributable without
downloads, and SQL-expressible for the DuckDB oracle.

Two engine paths, same semantics:
- ``sentiment_expr`` — pure built-in column expression (map literal +
  transform/aggregate fold). Stays JVM-side inside WholeStageCodegen: the
  100 TB hot path.
- ``sentiment_pandas_udf`` — Arrow-vectorized pandas UDF, the U1-parity
  form, for lexicons too large to inline as a literal (a real VADER lexicon
  would be broadcast; here the dict ships in the closure).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Frozen valence lexicon (VADER-style scale, roughly [-4, 4]).
LEXICON: dict[str, float] = {
    "fast": 2.1,
    "slow": -1.9,
    "small": 0.6,
    "big": -0.4,
    "good": 1.9,
    "bad": -2.5,
    "great": 3.1,
    "terrible": -3.4,
    "dup": -1.2,
    "spark": 1.5,
    "merge": 0.8,
    "hash": -0.3,
    "scan": -0.6,
    "query": 0.4,
    "window": 0.7,
    "stream": 1.1,
    "batch": -0.2,
    "vector": 0.9,
    "filter": -0.7,
    "error": -2.2,
    "crash": -3.0,
    "love": 3.2,
    "hate": -2.7,
    "join": 0.3,
    "sort": -0.1,
    "table": 0.2,
}

ALPHA = 15.0  # VADER normalization constant


def _compound(s: float) -> float:
    return s / math.sqrt(s * s + ALPHA)


def score_text(text: str | None) -> float:
    """Driver-side scalar scorer (tests / tiny data)."""
    if not text:
        return 0.0
    s = 0.0
    for w in text.lower().split(" "):
        v = LEXICON.get(w)
        if v is not None:
            s += v
    return round(_compound(s), 6)


def sentiment_expr(text_col: str | Column) -> Column:
    """Built-in-functions sentiment: lexicon map literal + aggregate fold.

    Entirely JVM-side (no Python worker), so it fuses into the scan stage.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    lex_map = F.create_map(*[F.lit(x) for kv in sorted(LEXICON.items()) for x in kv])
    tokens = F.split(F.lower(col), " ")
    s = F.aggregate(
        tokens,
        F.lit(0.0),
        lambda acc, w: acc + F.coalesce(F.element_at(lex_map, w), F.lit(0.0)),
    )
    compound = s / F.sqrt(s * s + F.lit(ALPHA))
    return F.when(col.isNull(), F.lit(0.0)).otherwise(F.round(compound, 6))


def valence_sum_expr(text_col: str | Column) -> Column:
    """The raw lexicon fold only (no compound normalization)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    lex_map = F.create_map(*[F.lit(x) for kv in sorted(LEXICON.items()) for x in kv])
    tokens = F.split(F.lower(col), " ")
    return F.aggregate(
        tokens,
        F.lit(0.0),
        lambda acc, w: acc + F.coalesce(F.element_at(lex_map, w), F.lit(0.0)),
    )


def with_sentiment(df, text_col: str = "text", out: str = "sentiment"):
    """Append a sentiment column via two projections.

    The aggregate fold is a CodegenFallback expression, so referencing it
    three times in one projection (s, s·s, and the null guard) evaluates
    the whole fold three times per row (~7× slower at sf0.1). Materializing
    the raw sum as its own attribute makes the compound arithmetic cheap;
    CollapseProject leaves the split alone because the producer expression
    is non-trivial and multiply-referenced.
    """
    raw, isnull = f"__{out}_raw", f"__{out}_isnull"
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    step = df.withColumn(isnull, col.isNull()).withColumn(raw, valence_sum_expr(col))
    s = F.col(raw)
    compound = F.round(s / F.sqrt(s * s + F.lit(ALPHA)), 6)
    return (
        step.withColumn(out, F.when(F.col(isnull), F.lit(0.0)).otherwise(compound))
        .drop(raw, isnull)
    )


# T.DoubleType() (not the DDL string "double"): string return types are
# parsed via the active SparkContext, which doesn't exist at import time.
@F.pandas_udf(T.DoubleType())
def sentiment_pandas_udf(texts: pd.Series) -> pd.Series:
    """U1-parity Arrow-vectorized UDF path."""
    lex = LEXICON
    alpha = ALPHA

    def score(t: str | None) -> float:
        if not t:
            return 0.0
        s = 0.0
        for w in t.lower().split(" "):
            v = lex.get(w)
            if v is not None:
                s += v
        return round(s / math.sqrt(s * s + alpha), 6)

    return texts.map(score)


def lexicon_values_sql() -> str:
    """Inline lexicon for the DuckDB oracle, e.g. ('fast', 2.1), …"""
    return ", ".join(f"('{w}', {v!r})" for w, v in sorted(LEXICON.items()))
