"""Driver-contract guards for __spark_entry__.py: the exact surface the
grading driver consumes must stay intact regardless of refactors."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_runs_and_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_queries_and_oracles_align(spark):
    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 123
    # every oracle belongs to a registered query; every query is callable
    assert set(osql) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    # oracles are non-empty SQL strings
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_query_has_oracle_or_is_documented():
    qs, osql = E.queries(), E.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    # current surface: every registered query carries an oracle (the HLL++
    # and percentile sketches self-judge via tolerance booleans) — a new
    # oracle-less query is a deliberate decision, not an accident
    assert missing == [], missing
