"""Property-based (hypothesis) tests: fuzzed equivalence between
independent implementations of the same contract.

Each property batches many generated inputs into ONE Spark job per
example set, so the fuzzing budget is spent on inputs, not JVM round
trips.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from reddit_sentiment_spark_streaming_pipeline_spark.functions.sentiment import (
    BOOSTERS,
    LEXICON,
    score_text,
    score_text_vader,
    with_sentiment,
    with_vader_sentiment,
)

# vocabulary that exercises every VADER code path: lexicon hits (both
# signs), boosters/dampeners, negators, the but-clause, neutral filler,
# ALL-CAPS variants, and punctuation runs
_WORDS = (
    sorted(LEXICON)[:8]
    + sorted(BOOSTERS)[:4]
    + ["not", "never", "but", "the", "stream", "query", "don't"]
)
_WORDS += [w.upper() for w in _WORDS[:6]]
_token = st.sampled_from(_WORDS + ["!", "!!", "?", "!?"])
_text = st.lists(_token, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_text, min_size=1, max_size=40))
def test_vader_column_algebra_matches_scalar(spark, texts):
    """The JVM column-algebra VADER and the pure-Python scalar scorer are
    independent implementations of the same spec — they must agree on
    arbitrary token soup, not just the curated cases."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.sentiment
        for r in with_vader_sentiment(df).select("doc_id", "sentiment").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == score_text_vader(t), repr(t)


@settings(max_examples=5, deadline=None)
@given(st.lists(_text, min_size=1, max_size=40))
def test_lexicon_sentiment_expr_matches_scalar(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.sentiment
        for r in with_sentiment(df).select("doc_id", "sentiment").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == score_text(t), repr(t)


@settings(max_examples=20, deadline=None)
@given(
    greens=st.dictionaries(st.sampled_from([f"q{i}" for i in range(12)]),
                           st.integers(min_value=1, max_value=5)),
    stale=st.sets(st.sampled_from([f"q{i}" for i in range(12)])),
)
def test_showcase_order_is_total_and_prioritized(greens, stale):
    """Rotation invariants on arbitrary verification histories: the order
    is a permutation of the registry, never-verified queries all precede
    verified ones, and stale queries precede fresh ones of any round."""
    from reddit_sentiment_spark_streaming_pipeline_spark import registry as R

    names = [f"q{i}" for i in range(12)]
    specs = {}
    for n in names:
        fn = (lambda spark, sf: None)
        fn.__name__ = n
        specs[n] = R.QuerySpec(name=n, fn=fn, oracle=None, module="<fake>")

    real_fp = R.query_fingerprint
    try:
        # current tree hashes to "cur": entries recorded as "old" mismatch
        R.query_fingerprint = lambda spec: "cur"  # noqa: E731
        order = R.showcase_order(
            registry=specs,
            fingerprints={n: {"sha256": ("old" if n in stale else "cur")} for n in names},
            greens=greens,
        )
    finally:
        R.query_fingerprint = real_fp

    assert sorted(order) == sorted(names)  # permutation, nothing dropped
    rank = {n: i for i, n in enumerate(order)}
    never = [n for n in names if n not in greens]
    verified = [n for n in names if n in greens]
    for nv in never:
        for v in verified:
            assert rank[nv] < rank[v], (nv, v)
    for s in verified:
        if s in stale:
            for f in verified:
                if f not in stale:
                    assert rank[s] < rank[f], (s, f)
