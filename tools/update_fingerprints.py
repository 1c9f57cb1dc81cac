"""Maintain tools/fingerprints.json for the staleness-aware showcase order.

fingerprints.json maps each driver-verified query to the sha256 of its
defining module's source *as of the code its last green CORRECTNESS row
actually verified*.  `registry.showcase_order()` compares those shas with
the current tree: a mismatch means the implementation (or embedded oracle
SQL) changed after the last driver check, so the query rotates back into
the driver's 50-query verification window.

Modes
-----
default (update): for every query green in the LATEST CORRECTNESS_r{N}.json,
    record {round: N, sha256: sha(current module file)}.  Run this at round
    start, BEFORE editing code — the tree then equals the code the driver
    just verified (the driver commits the tree before verifying).

--bootstrap: reconstruct history from git.  For each query, find its most
    recent green round and hash the module file at that round's results
    commit (``round N: verdict/...``), via ``git show``.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from reddit_sentiment_spark_streaming_pipeline_spark import registry  # noqa: E402

FP_PATH = os.path.join(_REPO, "tools", "fingerprints.json")


def _round_commits() -> dict[int, str]:
    """round number -> results-commit hash (``round N: ...`` commits)."""
    out = {}
    log = subprocess.run(
        ["git", "log", "--all", "--format=%H %s"],
        cwd=_REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m:
            out.setdefault(int(m.group(1)), sha)
    return out


def _module_relpath(module_name: str) -> str:
    mod = sys.modules[module_name]
    return os.path.relpath(mod.__file__, _REPO)


def bootstrap() -> dict:
    """Reconstruct every fingerprint from git: for each query, hash the
    per-query (block + helpers) fingerprint of its module AS OF the
    results commit of its last green round. Pure-text extraction
    (registry.fingerprint_from_source), so no historical import is
    needed. A query whose def didn't exist as a top-level registered
    block at that commit gets the whole-file sha (conservatively stale
    under the current scheme)."""
    commits = _round_commits()
    greens = registry.last_green_rounds()
    specs = registry.load_all()
    fps = {}
    for name, rnd in sorted(greens.items()):
        spec = specs.get(name)
        if spec is None:
            continue
        commit = commits.get(rnd)
        if commit is None:
            continue
        rel = _module_relpath(spec.module)
        blob = subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=_REPO, capture_output=True, check=True,
        ).stdout
        src = blob.decode("utf-8")
        fp = registry.fingerprint_from_source(src, spec.fn.__name__)
        fps[name] = {
            "round": rnd,
            "module": spec.module,
            "sha256": fp or hashlib.sha256(blob).hexdigest(),
            "block_sha": registry.block_sha_from_source(src, spec.fn.__name__),
        }
    return fps


def update() -> dict:
    try:
        with open(FP_PATH) as f:
            fps = json.load(f)
    except (OSError, ValueError):
        fps = {}
    greens = registry.last_green_rounds()
    latest = max(greens.values(), default=0)
    specs = registry.load_all()
    for name, rnd in sorted(greens.items()):
        if rnd != latest:
            continue
        spec = specs.get(name)
        if spec is None:
            continue
        fps[name] = {
            "round": rnd,
            "module": spec.module,
            "sha256": registry.query_fingerprint(spec),
            "block_sha": registry.query_block_sha(spec),
        }
    return fps


def backfill_block_shas() -> dict:
    """One-time migration: add ``block_sha`` (the query's own block as of
    its green round's results commit, via git show) to entries that
    predate the field. ``sha256`` values are left untouched — only the
    new field is derived from history."""
    with open(FP_PATH) as f:
        fps = json.load(f)
    commits = _round_commits()
    specs = registry.load_all()
    for name, entry in fps.items():
        if "block_sha" in entry:
            continue
        spec = specs.get(name)
        commit = commits.get(entry.get("round"))
        if spec is None or commit is None:
            continue
        rel = _module_relpath(spec.module)
        blob = subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=_REPO, capture_output=True, check=True,
        ).stdout
        entry["block_sha"] = registry.block_sha_from_source(
            blob.decode("utf-8"), spec.fn.__name__
        )
    return fps




def main() -> None:
    if "--bootstrap" in sys.argv:
        fps = bootstrap()
    elif "--backfill-block-shas" in sys.argv:
        fps = backfill_block_shas()
    else:
        fps = update()
    with open(FP_PATH, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(fps)} fingerprints -> {FP_PATH}")


if __name__ == "__main__":
    main()
