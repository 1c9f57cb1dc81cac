"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark at the given scale factor, runs its
DuckDB oracle SQL on the same parquet, and compares row-count, column set
and (order-insensitively) values. Floats are expected to be pre-rounded by
the queries themselves; comparison allows a tiny absolute tolerance to
absorb residual representation noise.

Usage:  python tools/check.py [sf_dir] [query ...]

Env axes: CHECK_HOSTILE=1 uses a driver-like default session (no UTC pin,
no tuned confs — combine with TZ=America/New_York); CHECK_ADVERSARIAL_CONF=1
additionally sets spark.sql.shuffle.partitions=7 and disables AQE, catching
any partition-count- or AQE-dependent result.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from reddit_sentiment_spark_streaming_pipeline_spark import registry  # noqa: E402
from reddit_sentiment_spark_streaming_pipeline_spark.session import get_spark  # noqa: E402
from reddit_sentiment_spark_streaming_pipeline_spark.sources.tables import TABLES  # noqa: E402

FLOAT_ATOL = 1e-9


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")  # unify int32/int64; stay integer
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} oracle={len(b)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        a_int = pd.api.types.is_integer_dtype(av)
        b_int = pd.api.types.is_integer_dtype(bv)
        a_flt = pd.api.types.is_float_dtype(av)
        b_flt = pd.api.types.is_float_dtype(bv)
        # The driver hashes dtype/representation: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT sum) is a FAIL even when
        # values are numerically equal. Mirror that strictness here.
        if (a_int and b_flt) or (a_flt and b_int):
            return False, (
                f"column {c!r}: dtype mismatch spark={av.dtype} oracle={bv.dtype} "
                "(integer vs float representation — driver hash would differ; "
                "CAST the oracle sum to BIGINT or the Spark column to double)"
            )
        if a_int and b_int:
            bad = av != bv  # exact integer equality, no tolerance
        elif a_flt and b_flt:
            bad = ~(
                (av.isna() & bv.isna())
                | ((av - bv).abs() <= FLOAT_ATOL)
                | ((av - bv).abs() <= 1e-9 * av.abs().clip(lower=1))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        nbad = int(bad.sum())
        if nbad:
            i = bad.idxmax()
            return False, (
                f"column {c!r}: {nbad} mismatched values; first at sorted-row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r}"
            )
    return True, "ok"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    specs = registry.load_all()
    if args and args[0] == "--window":
        # exactly the driver's per-round gate: the first N of queries()
        # in showcase order (never-verified, then stale, then fresh)
        n = int(args[1]) if len(args) > 1 else 50
        names = list(specs)[:n]
    elif args and args[0] == "--stale":
        # the whole unverified class (never-verified + stale), window
        # overflow included: the one command that pays the staleness debt
        # down locally when the class exceeds the driver's 50-slot sample
        import json as _json

        greens = registry.last_green_rounds()
        try:
            with open(registry._FINGERPRINTS_PATH) as f:
                fps = _json.load(f)
        except OSError:
            fps = {}
        names = [
            name for name, spec in specs.items()
            if name not in greens
            or (fps.get(name) or {}).get("sha256") != registry.query_fingerprint(spec)
        ]
        print(f"unverified class: {len(names)} queries (never-verified + stale)")
    else:
        names = args or sorted(specs)
    if os.environ.get("CHECK_HOSTILE"):
        # reproduce the driver's conditions: default configs, no UTC pin,
        # no AQE/Arrow tuning — the loaders must self-defend
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
        if os.environ.get("CHECK_ADVERSARIAL_CONF"):
            # beyond-the-driver adversarial axis: a prime partition count
            # and no AQE, so any result that depends on partition layout
            # or on AQE coalescing (keep-last/top-k tie-breaks, implicit
            # ordering) surfaces as a value mismatch
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
    else:
        spark = get_spark("check")
    con = duck_con(sf_dir)
    failures = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        ok, msg = frames_equal(sdf, odf)
        status = "ok  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status}  {name}: {len(sdf)} rows vs {len(odf)} oracle — {msg} [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
