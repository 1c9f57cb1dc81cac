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


# ---------------------------------------------------------------------------
# Full VADER-semantics scoring (negation / boosters / caps / punctuation).
#
# Parity: reddit_consumer.py:90-99 calls real VADER, whose compound score is
# not just a lexicon sum — it applies the heuristics published in Hutto &
# Gilbert (2014) and implemented in the public vaderSentiment source:
#   * ALL-CAPS emphasis: a mixed-case text's all-caps lexicon word gets
#     ±C_INCR (0.733) in the direction of its valence.
#   * Booster/dampener words within 3 positions before a lexicon word add
#     sign(v)·(b + caps_bonus), damped ×1.0 / ×0.95 / ×0.9 by distance.
#   * Negation within 3 positions before flips the (boosted) valence ×-0.74.
#   * A "but" clause reweights: sentiments before "but" ×0.5, after ×1.5.
#   * Punctuation emphasis on the summed valence: min(n_excl,4)·0.292 plus
#     0.18·n_qm for 2-3 question marks (0.96 for >3), added toward the sign
#     of the sum; then compound = s/sqrt(s²+15).
# Tokens are punctuation-stripped at the edges before every lookup (VADER's
# words_and_emoticons does the same), so "good!!!" hits the lexicon AND the
# exclamations amplify.
# Divergences (documented, deliberate): no multi-word idioms ("kind of",
# "never so"), no "least" special case, and the frozen mini-lexicon above
# instead of VADER's 7,500-entry one — keeps scores deterministic and the
# whole computation expressible identically in Spark column algebra and
# DuckDB SQL (indexed list lambdas + sequential fold in both engines, so
# floating-point evaluation order is bit-identical).
# ---------------------------------------------------------------------------

B_INCR = 0.293
BOOSTERS: dict[str, float] = {
    "absolutely": B_INCR, "amazingly": B_INCR, "completely": B_INCR,
    "extremely": B_INCR, "incredibly": B_INCR, "really": B_INCR,
    "so": B_INCR, "totally": B_INCR, "utterly": B_INCR, "very": B_INCR,
    "almost": -B_INCR, "barely": -B_INCR, "hardly": -B_INCR,
    "kinda": -B_INCR, "marginally": -B_INCR, "occasionally": -B_INCR,
    "partly": -B_INCR, "scarcely": -B_INCR, "slightly": -B_INCR,
    "somewhat": -B_INCR,
}

NEGATORS: list[str] = [
    "not", "no", "never", "none", "nobody", "nothing", "neither", "nor",
    "cannot", "cant", "dont", "doesnt", "didnt", "isnt", "wasnt", "wont",
    "without", "aint",
]

N_SCALAR = -0.74   # negation flip factor
C_INCR = 0.733     # ALL-CAPS emphasis
DAMP = {1: 1.0, 2: 0.95, 3: 0.9}   # booster distance damping
BUT_BEFORE, BUT_AFTER = 0.5, 1.5


def _is_caps(w: str) -> bool:
    return w.upper() == w and w.lower() != w


_STRIP_RE = r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$"


def _strip_punc(w: str) -> str:
    import re

    return re.sub(_STRIP_RE, "", w)


def score_text_vader(text: str | None) -> float:
    """Driver-side scalar reference for the full VADER semantics (tests)."""
    if not text:
        return 0.0
    toks = [_strip_punc(t) for t in text.split(" ") if t]
    caps_cnt = sum(1 for t in toks if _is_caps(t))
    cap_diff = 0 < caps_cnt < len(toks)
    low = [t.lower() for t in toks]
    but_pos = low.index("but") + 1 if "but" in low else 0
    s = 0.0
    for i, w in enumerate(toks):
        p = i + 1
        v0 = LEXICON.get(low[i], 0.0)
        sign0 = 1.0 if v0 > 0 else (-1.0 if v0 < 0 else 0.0)
        v = v0 + (sign0 * C_INCR if cap_diff and _is_caps(w) else 0.0)
        negated = False
        for d in (1, 2, 3):
            if p <= d:
                continue
            prev = toks[p - d - 1]
            lp = prev.lower()
            b = BOOSTERS.get(lp, 0.0)
            if v0 != 0.0 and b != 0.0:
                caps_b = C_INCR if cap_diff and _is_caps(prev) else 0.0
                v += (b + caps_b) * sign0 * DAMP[d]
            if lp in NEGATORS or "n't" in lp:
                negated = True
        if negated and v0 != 0.0:
            v *= N_SCALAR
        if but_pos:
            v *= BUT_BEFORE if p < but_pos else (BUT_AFTER if p > but_pos else 1.0)
        s += v
    n_ex = text.count("!")
    n_qm = text.count("?")
    punct = min(n_ex, 4) * 0.292 + (
        (n_qm * 0.18 if n_qm <= 3 else 0.96) if n_qm > 1 else 0.0
    )
    if s > 0:
        s += punct
    elif s < 0:
        s -= punct
    return round(_compound(s), 6)


def _caps_pred(col: Column) -> Column:
    return (F.upper(col) == col) & (F.lower(col) != col)


def with_vader_sentiment(df, text_col: str = "text", out: str = "sentiment"):
    """Append a full-VADER-semantics sentiment column (pure column algebra).

    Stepwise projections materialize the token array, cap-differential flag,
    but-position and the per-token valence list as their own attributes, so
    the (CodegenFallback) higher-order functions each evaluate once per row.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks_c, lt_c, capd_c, but_c, vl_c, s_c = (
        f"__{out}_toks", f"__{out}_lt", f"__{out}_capd", f"__{out}_but",
        f"__{out}_vlist", f"__{out}_s",
    )
    lex_map = F.create_map(*[F.lit(x) for kv in sorted(LEXICON.items()) for x in kv])
    boost_map = F.create_map(*[F.lit(x) for kv in sorted(BOOSTERS.items()) for x in kv])

    step = df.withColumn(
        toks_c,
        F.transform(
            F.filter(F.split(col, " "), lambda w: w != ""),
            lambda w: F.regexp_replace(w, _STRIP_RE, ""),
        ),
    )
    toks = F.col(toks_c)
    # lowered tokens precomputed once: CodegenFallback lambdas get no
    # common-subexpression elimination, so each lower() inside the valence
    # lambda would otherwise re-run up to 4× per token
    step = step.withColumn(lt_c, F.transform(toks, F.lower))
    lt = F.col(lt_c)
    caps_cnt = F.size(F.filter(toks, _caps_pred))
    step = step.withColumn(
        capd_c, (caps_cnt > 0) & (caps_cnt < F.size(toks))
    ).withColumn(but_c, F.array_position(lt, "but"))
    cap_diff, but_pos = F.col(capd_c), F.col(but_c)

    def tok_valence(w: Column, i: Column) -> Column:
        p = i + F.lit(1)
        v0 = F.coalesce(F.element_at(lex_map, F.element_at(lt, p)), F.lit(0.0))
        sign0 = F.when(v0 > 0, 1.0).when(v0 < 0, -1.0).otherwise(0.0)
        v = v0 + F.when(cap_diff & _caps_pred(w), sign0 * C_INCR).otherwise(0.0)
        negated = F.lit(False)
        for d in (1, 2, 3):
            prev = F.when(p > d, F.element_at(toks, p - F.lit(d)))
            lp = F.when(p > d, F.element_at(lt, p - F.lit(d)))
            b = F.coalesce(F.element_at(boost_map, lp), F.lit(0.0))
            caps_b = F.when(cap_diff & _caps_pred(prev), C_INCR).otherwise(0.0)
            v = v + F.when(
                (v0 != 0.0) & (b != 0.0), (b + caps_b) * sign0 * F.lit(DAMP[d])
            ).otherwise(0.0)
            negated = negated | F.coalesce(
                lp.isin(NEGATORS) | lp.contains("n't"), F.lit(False)
            )
        v = F.when(negated & (v0 != 0.0), v * N_SCALAR).otherwise(v)
        return F.when(
            but_pos > 0,
            v * F.when(p < but_pos, BUT_BEFORE)
                 .when(p > but_pos, BUT_AFTER).otherwise(1.0),
        ).otherwise(v)

    step = step.withColumn(vl_c, F.transform(toks, tok_valence))
    s_raw = F.aggregate(F.col(vl_c), F.lit(0.0), lambda acc, x: acc + x)
    step = step.withColumn(s_c, F.coalesce(s_raw, F.lit(0.0)))

    n_ex = F.length(col) - F.length(F.replace(col, F.lit("!"), F.lit("")))
    n_qm = F.length(col) - F.length(F.replace(col, F.lit("?"), F.lit("")))
    punct = F.least(n_ex, F.lit(4)) * 0.292 + F.when(
        n_qm > 1, F.when(n_qm <= 3, n_qm * 0.18).otherwise(0.96)
    ).otherwise(0.0)
    s0 = F.col(s_c)
    s = F.when(s0 > 0, s0 + punct).when(s0 < 0, s0 - punct).otherwise(s0)
    compound = F.round(s / F.sqrt(s * s + F.lit(ALPHA)), 6)
    return (
        step.withColumn(
            out, F.when(col.isNull(), F.lit(0.0)).otherwise(compound)
        ).drop(toks_c, lt_c, capd_c, but_c, vl_c, s_c)
    )


def booster_values_sql() -> str:
    return ", ".join(f"('{w}', {v!r})" for w, v in sorted(BOOSTERS.items()))


def vader_doc_sql(source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB CTE chain computing the identical full-VADER compound per doc.

    Mirrors ``with_vader_sentiment`` operation-for-operation: same token
    filter, same indexed-lambda per-token valence, same sequential
    ``list_reduce`` fold (prepending 0.0 so the FP accumulation order equals
    Spark's ``aggregate``), same punctuation and normalization.
    Emits a CTE named ``vader_doc(doc_id, sentiment)``.
    """
    lex_case = " ".join(
        f"WHEN '{w}' THEN {v!r}" for w, v in sorted(LEXICON.items())
    )
    boost_case = " ".join(
        f"WHEN '{w}' THEN {v!r}" for w, v in sorted(BOOSTERS.items())
    )
    negs = ", ".join(f"'{w}'" for w in NEGATORS)

    def prev(d: int) -> str:
        return f"(CASE WHEN p > {d} THEN lower(toks[p-{d}]) END)"

    def boost_term(d: int) -> str:
        lp = prev(d)
        return f"""
          CASE WHEN v0 <> 0.0 AND coalesce(b{d}, 0.0) <> 0.0
               THEN (b{d} + CASE WHEN capd AND p > {d}
                                  AND upper(toks[p-{d}]) = toks[p-{d}]
                                  AND lower(toks[p-{d}]) <> toks[p-{d}]
                            THEN {C_INCR!r} ELSE 0.0 END) * sign0 * {DAMP[d]!r}
               ELSE 0.0 END"""

    neg_term = " OR ".join(
        f"coalesce({prev(d)} IN ({negs}) OR contains({prev(d)}, 'n''t'), false)"
        for d in (1, 2, 3)
    )
    # Per-token valence: nested lets via a LATERAL-free trick — DuckDB
    # lambdas can't bind names, so v0/sign0/b{d} are inlined by macros below.
    tok_expr = f"""
        CASE WHEN but_pos > 0
             THEN (CASE WHEN ({neg_term}) AND v0 <> 0.0
                        THEN vboost * {N_SCALAR!r} ELSE vboost END)
                  * (CASE WHEN p < but_pos THEN {BUT_BEFORE!r}
                          WHEN p > but_pos THEN {BUT_AFTER!r} ELSE 1.0 END)
             ELSE (CASE WHEN ({neg_term}) AND v0 <> 0.0
                        THEN vboost * {N_SCALAR!r} ELSE vboost END)
        END"""
    vboost = f"""(v0
        + (CASE WHEN capd AND upper(w) = w AND lower(w) <> w
                THEN sign0 * {C_INCR!r} ELSE 0.0 END)
        + ({boost_term(1)}) + ({boost_term(2)}) + ({boost_term(3)}))"""
    sign0 = "(CASE WHEN v0 > 0 THEN 1.0 WHEN v0 < 0 THEN -1.0 ELSE 0.0 END)"
    v0 = f"(CASE lower(w) {lex_case} ELSE 0.0 END)"
    for d in (1, 2, 3):
        vboost = vboost.replace(
            f"b{d}", f"(CASE {prev(d)} {boost_case} ELSE 0.0 END)"
        )
    tok_expr = tok_expr.replace("vboost", vboost)
    tok_expr = tok_expr.replace("sign0", sign0).replace("v0", v0)

    return f"""
        WITH vd_base AS (
            SELECT doc_id, text,
                   list_transform(
                       list_filter(string_split(text, ' '), x -> x <> ''),
                       w -> regexp_replace(w, '{_STRIP_RE}', '', 'g')) AS toks
            FROM ({source_sql})
        ),
        vd_feat AS (
            SELECT doc_id, text, toks,
                   (len(list_filter(toks, w -> upper(w) = w AND lower(w) <> w)) > 0
                    AND len(list_filter(toks, w -> upper(w) = w AND lower(w) <> w)) < len(toks))
                       AS capd,
                   coalesce(list_position(list_transform(toks, w -> lower(w)), 'but'), 0)
                       AS but_pos
            FROM vd_base
        ),
        vd_sum AS (
            SELECT doc_id, text,
                   coalesce(list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(toks, (w, p) -> CAST({tok_expr} AS DOUBLE))),
                       (acc, x) -> acc + x), 0.0) AS s0,
                   length(text) - length(replace(text, '!', '')) AS n_ex,
                   length(text) - length(replace(text, '?', '')) AS n_qm
            FROM vd_feat
        ),
        vader_doc AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN 0.0 ELSE round(
                     s / sqrt(s * s + {ALPHA!r}), 6) END AS sentiment
            FROM (
                SELECT doc_id, text,
                       CASE WHEN s0 > 0 THEN s0 + punct
                            WHEN s0 < 0 THEN s0 - punct ELSE s0 END AS s
                FROM (
                    SELECT *,
                           least(n_ex, 4) * 0.292 +
                           (CASE WHEN n_qm > 1 THEN
                                 (CASE WHEN n_qm <= 3 THEN n_qm * 0.18
                                       ELSE 0.96 END) ELSE 0.0 END) AS punct
                    FROM vd_sum
                )
            )
        )
    """
