"""Pin scale-evidence "artifact" rows to the query plans the artifacts
actually measured (VERDICT r8 item 2).

Root cause being closed: `SCALE_EVIDENCE.md` classifies a query as
"artifact — measured directly" whenever ANY committed REHEARSAL_*.json
measured it, but nothing tied that artifact to the query's CURRENT
implementation — the r8 `embedding_near_dups` redesign silently orphaned
its r6 artifact (which had measured the since-replaced single-bucket
plan) and the docs kept claiming "measured directly".

Mechanism: for every committed artifact and every registered query it
measured, recover the query's per-query fingerprint AS OF the commit
that added the artifact (pure-text extraction via
registry.fingerprint_from_source over `git show`, the
update_fingerprints --bootstrap technique — the artifact is committed
right after the run per repo convention, so module-at-artifact-commit
is the measured code). Newer artifacts embed their fingerprints at run
time (scale_rehearsal.py `fingerprints` key), which takes precedence
over the git reconstruction for those files.

The committed output `tools/scale_evidence_pins.json` maps each
artifact-measured query to the set of fingerprints its artifacts
measured; `tests/test_scale_evidence.py` fails when a query's CURRENT
block fingerprint matches none of them — a plan rewrite now stales its
scale evidence exactly the way it stales its correctness row, and the
fix is to re-run the rehearsal on the new plan (never to hand-edit the
pins: regeneration is deterministic from git + artifacts).

Both granularities are recorded per artifact:
- block_sha:  the query's own block (decorator + def). A mismatch means
              the QUERY'S PLAN was rewritten -> hard test failure.
- sha256:     block + module helpers (the staleness fingerprint). A
              helper-only mismatch (block_sha matches, sha256 doesn't)
              is reported by the tool as a WATCH item but does not fail
              the test: module helpers are shared across many queries,
              and orphaning every sibling's evidence on any helper edit
              would force full rehearsal re-runs for queries whose
              plans are unchanged. The correctness gate (driver oracle
              rows) already re-verifies helper-staled queries.

Run:  python tools/pin_scale_evidence.py          # regenerate pins
      python tools/pin_scale_evidence.py --report # mismatch report only
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from reddit_sentiment_spark_streaming_pipeline_spark import registry  # noqa: E402
from tools.scale_evidence import artifact_queries  # noqa: E402

PINS_PATH = os.path.join(_REPO_ROOT, "tools", "scale_evidence_pins.json")


def _artifact_commit(path: str) -> str | None:
    """Commit that added the artifact file (artifacts are never edited)."""
    rel = os.path.relpath(path, _REPO_ROOT)
    out = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "--", rel],
        cwd=_REPO_ROOT, capture_output=True, text=True, check=True,
    ).stdout.split()
    return out[-1] if out else None


def _measured_in(art: dict) -> set[str]:
    names: set[str] = set()
    for key in ("scaling_x", "shuffle_scaling_x", "base", "big"):
        v = art.get(key)
        if isinstance(v, dict):
            names |= {k for k, vv in v.items() if isinstance(vv, (dict, int, float))}
    return names


def build_pins() -> dict[str, dict]:
    specs = registry.load_all()
    arts = artifact_queries()
    pins: dict[str, dict] = {
        q: {"block_shas": set(), "sha256s": set(), "artifacts": []} for q in arts
    }
    blob_cache: dict[tuple[str, str], str | None] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "REHEARSAL_*.json"))):
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, ValueError):
            continue
        measured = _measured_in(art) & set(arts)
        if not measured:
            continue
        fname = os.path.basename(path)
        embedded = art.get("fingerprints") or {}
        commit = _artifact_commit(path)
        for q in sorted(measured):
            spec = specs[q]
            entry = pins[q]
            if q in embedded:  # run-time pinned (newer artifacts)
                entry["block_shas"].add(embedded[q]["block_sha"])
                entry["sha256s"].add(embedded[q]["sha256"])
                entry["artifacts"].append({"file": fname, "pinned": "embedded"})
                continue
            if commit is None:  # not committed yet: pin to current code
                bsha, fp = registry.query_block_sha(spec), registry.query_fingerprint(spec)
            else:
                rel = os.path.relpath(
                    sys.modules[spec.module].__file__, _REPO_ROOT)
                key = (commit, rel)
                if key not in blob_cache:
                    r = subprocess.run(
                        ["git", "show", f"{commit}:{rel}"],
                        cwd=_REPO_ROOT, capture_output=True)
                    blob_cache[key] = (
                        r.stdout.decode("utf-8") if r.returncode == 0 else None)
                src = blob_cache[key]
                if src is None:
                    continue  # module didn't exist at that commit
                bsha = registry.block_sha_from_source(src, spec.fn.__name__)
                fp = registry.fingerprint_from_source(src, spec.fn.__name__)
            if bsha is None:
                continue  # query not yet a registered block at that commit
            entry["block_shas"].add(bsha)
            entry["sha256s"].add(fp)
            entry["artifacts"].append(
                {"file": fname, "pinned": (commit or "worktree")[:12]})
    return {
        q: {
            "block_shas": sorted(e["block_shas"]),
            "sha256s": sorted(x for x in e["sha256s"] if x),
            "artifacts": e["artifacts"],
        }
        for q, e in pins.items() if e["block_shas"]
    }


def report(pins: dict[str, dict]) -> tuple[list[str], list[str]]:
    """(hard failures: block rewritten, watch: helper-only drift)."""
    specs = registry.load_all()
    hard, watch = [], []
    for q, e in sorted(pins.items()):
        cur_b = registry.query_block_sha(specs[q])
        cur_f = registry.query_fingerprint(specs[q])
        if cur_b not in e["block_shas"]:
            hard.append(q)
        elif cur_f not in e["sha256s"]:
            watch.append(q)
    return hard, watch


def main() -> None:
    pins = build_pins()
    hard, watch = report(pins)
    print(f"pinned {len(pins)} artifact-measured queries")
    print(f"PLAN-REWRITTEN (evidence orphaned, test will fail): {hard}")
    print(f"helper-only drift (watch, not failing): {watch}")
    if "--report" in sys.argv:
        return
    with open(PINS_PATH, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {PINS_PATH}")


if __name__ == "__main__":
    main()
