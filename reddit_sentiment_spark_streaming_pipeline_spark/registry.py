"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers here as a named QuerySpec:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for the DuckDB correctness oracle, or
  ``None`` for genuinely non-SQL-expressible ops (driver then records a
  weaker rows-only check).

``__spark_entry__.py`` exposes this registry to the driver; ``bench.py``
times a subset of it; ``tests/`` assert per-operator semantics on top.
"""

from __future__ import annotations

import glob
import hashlib
import importlib
import importlib.util
import json
import os
import re
import sys
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    module: str = field(default="", compare=False)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import (order = SURVEY.md §7 build order).
_QUERY_MODULES = [
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.events",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.posts",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.refs",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.sentiment",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.tfidf",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.dashboard",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.relational",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.dedup",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.similarity",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.textstats",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.pii",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.windows",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.temporal",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.analytic",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.graph",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.timeseries",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.sketches",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.curation",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.selection",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.ingest",
    "reddit_sentiment_spark_streaming_pipeline_spark.operators.winnowing",
    "reddit_sentiment_spark_streaming_pipeline_spark.sql",
    "reddit_sentiment_spark_streaming_pipeline_spark.sinks",
    "reddit_sentiment_spark_streaming_pipeline_spark.streaming.posts",
]


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=doc, module=fn.__module__
        )
        return fn

    return deco


# --- staleness-aware presentation order -----------------------------------
#
# The driver's correctness gate samples a 50-query prefix of `queries()`
# each round, so the prefix must always hold the queries most in need of
# (re-)verification.  Instead of a hand-maintained list, the order is
# computed from two inputs:
#
#   * CORRECTNESS_r*.json (repo root, driver-written): the most recent
#     round each query had a green row.
#   * tools/fingerprints.json (checked in, maintained by
#     tools/update_fingerprints.py): each query's per-query fingerprint
#     (its own def block incl. the @register oracle + the module's shared
#     helper code) *as of the code that green row actually verified*.
#
# A query is STALE when its current fingerprint differs from the stored
# one — i.e. its implementation, its oracle, or a helper it rides on
# changed after the last driver check.  Editing one query does not stale
# its siblings; editing shared helpers conservatively stales the whole
# module.  Sort: never-verified first; then stale queries whose OWN block
# changed (directly edited code — the highest-risk unverified class),
# oldest green round first; then everything else by oldest green round
# (helper-only stale before fresh within the same round), registration
# order as the tiebreak.  The round-first tail rank makes the window
# DRAIN verification recency debt: a query whose newest driver row is n
# rounds old re-enters the window ahead of recently-proven code even when
# nothing changed, so no query's last driver check can age indefinitely
# (with a ~150-query registry and a 50-slot window, a full recheck cycle
# is ~3 rounds).

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FINGERPRINTS_PATH = os.path.join(_REPO_ROOT, "tools", "fingerprints.json")

_ORDER_CACHE: list[str] | None = None


def _row_is_green(row: dict) -> bool:
    """Driver row counts as verified: full hash match, or the by-design
    rows-only check for oracle-less queries."""
    if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
        return True
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def last_green_rounds() -> dict[str, int]:
    """query name -> most recent round with a green driver row."""
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_is_green(row):
                out[name] = max(out.get(name, 0), rnd)
    return out


def module_sha(module_name: str) -> str | None:
    """sha256 of the module's current source file (covers both the query
    implementation and its embedded oracle SQL)."""
    src = _module_source(module_name)
    return None if src is None else hashlib.sha256(src.encode()).hexdigest()


def _module_source(module_name: str) -> str | None:
    mod = sys.modules.get(module_name)
    path = getattr(mod, "__file__", None)
    if path is None:
        try:
            spec = importlib.util.find_spec(module_name)
            path = spec.origin if spec else None
        except (ImportError, ValueError):
            path = None
    if not path or not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return f.read()


def query_blocks(source: str) -> dict[str, str]:
    """Map each @register-decorated function NAME in the module source to
    its full source block (decorator call — which embeds the oracle SQL —
    through the end of the def). Pure text + ast: needs no import, so the
    same extraction runs on historical file contents from git."""
    import ast

    lines = source.splitlines(keepends=True)
    out: dict[str, str] = {}
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return out
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef) or not node.decorator_list:
            continue
        is_reg = any(
            isinstance(d, ast.Call)
            and getattr(d.func, "id", getattr(d.func, "attr", None)) == "register"
            for d in node.decorator_list
        )
        if not is_reg:
            continue
        start = min(d.lineno for d in node.decorator_list) - 1
        out[node.name] = "".join(lines[start : node.end_lineno])
    return out


def fingerprint_from_source(source: str, fn_name: str) -> str | None:
    """Per-query staleness fingerprint over given module SOURCE: the
    query's own block (decorator incl. oracle + def body) plus the
    module's helper code (source minus every registered block). Editing
    one query stales only that query; editing shared helpers/constants
    conservatively stales the whole module — helpers feed behavior
    without appearing in any block."""
    blocks = query_blocks(source)
    block = blocks.get(fn_name)
    if block is None:
        return None
    helpers = source
    for b in blocks.values():
        helpers = helpers.replace(b, "", 1)
    # normalize away blank-line residue: inserting or removing a sibling
    # block must not change the helper hash via its surrounding newlines
    helpers = "\n".join(ln for ln in helpers.splitlines() if ln.strip())
    return hashlib.sha256((helpers + "\n===\n" + block).encode()).hexdigest()


def block_sha_from_source(source: str, fn_name: str) -> str | None:
    """sha256 of the query's own block alone (no helpers): distinguishes
    directly-edited queries from helper-only (conservative) staleness."""
    block = query_blocks(source).get(fn_name)
    return None if block is None else hashlib.sha256(block.encode()).hexdigest()


_FP_CACHE: dict[tuple[str, str], str | None] = {}
_BLOCK_CACHE: dict[tuple[str, str], str | None] = {}


def query_fingerprint(spec: QuerySpec) -> str | None:
    key = (spec.module, spec.fn.__name__)
    if key not in _FP_CACHE:
        src = _module_source(spec.module)
        fp = None
        if src is not None:
            fp = fingerprint_from_source(src, spec.fn.__name__)
            if fp is None:  # fn not found as a top-level registered def
                fp = module_sha(spec.module)
        _FP_CACHE[key] = fp
    return _FP_CACHE[key]


def query_block_sha(spec: QuerySpec) -> str | None:
    key = (spec.module, spec.fn.__name__)
    if key not in _BLOCK_CACHE:
        src = _module_source(spec.module)
        _BLOCK_CACHE[key] = (
            None if src is None else block_sha_from_source(src, spec.fn.__name__)
        )
    return _BLOCK_CACHE[key]


def showcase_order(
    registry: dict[str, QuerySpec] | None = None,
    fingerprints: dict | None = None,
    greens: dict[str, int] | None = None,
) -> list[str]:
    """Deterministic presentation order: never-verified, then
    block-changed stale (oldest-green first), then everything else by
    oldest green round — helper-only stale ahead of fresh within the
    same round; registration order breaks remaining ties."""
    reg = registry if registry is not None else _REGISTRY
    if greens is None:
        greens = last_green_rounds()
    if fingerprints is None:
        try:
            with open(_FINGERPRINTS_PATH) as f:
                fingerprints = json.load(f)
        except (OSError, ValueError):
            fingerprints = {}
    def key(item):
        i, (name, spec) = item
        rnd = greens.get(name)
        if rnd is None:
            return (0, 0, 0, i)  # never driver-verified
        fp = fingerprints.get(name)
        cur = query_fingerprint(spec)
        if fp is None or cur is None or fp.get("sha256") != cur:
            # stale. A query whose OWN block changed since its green row
            # (or whose block history is unknown) outranks everything
            # verified — directly edited code is the highest-risk
            # unverified class. Helper-only (conservative) staleness
            # instead folds into the round-recency drain below: it ranks
            # by the age of its last driver row, just ahead of fresh
            # queries of the same round.
            stored_block = (fp or {}).get("block_sha")
            cur_block = query_block_sha(spec)
            helper_only = (
                stored_block is not None
                and cur_block is not None
                and stored_block == cur_block
            )
            if not helper_only:
                return (1, rnd, 0, i)
            return (2, rnd, 0, i)
        return (2, rnd, 1, i)  # fresh: proven on current code

    return [name for _, (name, _) in sorted(enumerate(reg.items()), key=key)]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    ordered so the driver's 50-query prefix window always holds the
    queries most in need of (re-)verification."""
    global _ORDER_CACHE
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — only swallow the
            # *target* module being absent, not its broken imports.
            if mod not in str(e):
                raise
    if _ORDER_CACHE is None or set(_ORDER_CACHE) != set(_REGISTRY):
        _ORDER_CACHE = showcase_order()
    return {n: _REGISTRY[n] for n in _ORDER_CACHE}


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]


def oracle_of(name: str) -> str:
    """Oracle SQL of an ALREADY-IMPORTED query, for oracle composition.

    Deliberately does NOT call load_all(): composition sites run at
    module-import time (an @register decorator argument referencing an
    earlier sibling's oracle), where triggering the full module sweep
    would recurse. The composing query must therefore live in the same
    module as (or a module imported after) its constituents.
    """
    spec = _REGISTRY.get(name)
    if spec is None:
        raise ValueError(
            f"query {name!r} is not registered yet — a composing query "
            "must live in the same module as (or one imported after) "
            "its constituents; check _QUERY_MODULES order"
        )
    if spec.oracle is None:
        raise ValueError(f"query {name!r} has no oracle to compose")
    return spec.oracle
