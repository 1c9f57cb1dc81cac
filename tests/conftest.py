from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from reddit_sentiment_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"
ORACLE_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Tests run sf0.001 fixtures where 32-way task fan-out is pure
    # scheduling overhead: the identical suite measured 21% faster at 8
    # cores (r13; consistent with the bench's own c8-beats-c32 result at
    # sf0.1). Default the TEST session to 8; an explicit
    # SPARK_GRAFT_CPUS from the environment still wins.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests", driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SMOKE_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from reddit_sentiment_spark_streaming_pipeline_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SMOKE_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
