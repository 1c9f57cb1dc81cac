"""COVERAGE.md doc-rot guards: the parity matrix must reference real
queries, and every registered query must appear in the matrix."""

from __future__ import annotations

import os
import re

from reddit_sentiment_spark_streaming_pipeline_spark import registry

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "COVERAGE.md")

# non-query identifiers that legitimately appear in backticks: modules,
# functions, files, config options
_NOT_QUERIES = re.compile(
    r"[./()]|::|^tests?$|^test_|^[A-Z_]+$|\s"
)


def _backticked_names() -> set[str]:
    with open(_DOC) as f:
        text = f.read()
    return {m.group(1) for m in re.finditer(r"`([^`]+)`", text)}


def test_every_backticked_query_name_is_registered():
    reg = registry.load_all()
    names = _backticked_names()
    # names that LOOK like query keys (lower_snake identifiers) but are
    # not registered are doc rot — catch renames and deletions
    lookalike = {
        n for n in names
        if re.fullmatch(r"[a-z][a-z0-9_]{3,}", n)
        and not _NOT_QUERIES.search(n)
        and ("_" in n)
    }
    # whitelist: non-query snake_case terms the doc legitimately uses
    whitelist = {
        "queries", "oracle_sql", "doc_id", "event_id", "user_id",
        "created_utc", "created_time", "ingest_time", "text_length",
        "subreddit_stats", "approx_count_distinct", "from_json",
        "regexp_extract_all", "foreachBatch", "processed_", "vec_id",
        "read_wire_kafka", "read_wire_stream", "read_wire_socket",
        "write_wire_chunks", "synthetic_wire", "load_table",
        "register_views", "max_files_per_trigger", "maxFilesPerTrigger",
        "time_bucket_gapfill", "locf", "to_sql", "date_trunc",
        "vector_to_array", "posexplode", "pandas_udf", "session_window",
        "spark_sql", "show_console", "enforce_retention", "jdbc_writer",
        "write_partitioned_parquet", "purchase_click_join_stream",
        "windowed_counts_stream", "process_batch", "timestampFormat",
        "dropDuplicatesWithinWatermark", "applyInPandasWithState",
        "withWatermark", "row_number", "date_format",
        # bench.py timing rows that are not registry queries
        "streaming_replay", "streaming_socket_replay",
        # module-level decoder functions referenced by name
        "decode_image", "decode_png", "decode_pgm", "decode_wav",
        "decode_jpeg",
        # observed-metric names (CollectMetrics), not registry queries
        "lsh_bucket_cap",
        # streaming-gate internals + rehearsal-artifact field names
        "gate_batch", "rows_drained", "rows_expected", "chaos_durable",
        "novel_against_store", "after_batch_hook", "forced_gates",
        "start_windowed_parquet_query", "start_join_parquet_query",
        "compact_store", "assert_store_not_mid_compaction",
        # artifact JSON keys referenced by the changelog
        "env_knobs",
        "start_neardup_gate", "neardup_gate_batch", "chaos_compaction",
        "start_pipeline", "twin_merged_base_docs",
        # compact_store swap-window names (chaos-compact rehearsal)
        "tmp_complete", "dest_deleted",
        "state_mem_attribution", "state_mem_scaling_x",
        "memoryUsedBytes",
        # fixture key columns named by the skew-rehearsal bullet
        "event_type", "o_custkey",
        # r12 arrival-order / composed-ingest internals referenced by the
        # changelog: functions, CLI subcommands and the precedence column
        "arrival_seq", "cmd_ingest", "cmd_gate", "ingest_batch",
        "ingest_corpus", "raise_error", "stage2_ranked", "stage2_rejected",
        "write_doc_chunks_arrival", "write_ingest_chunks_arrival",
    }
    unknown = {n for n in lookalike - set(reg) if n not in whitelist}
    assert not unknown, f"COVERAGE.md references unregistered names: {sorted(unknown)}"


def test_every_registered_query_is_documented():
    reg = registry.load_all()
    names = _backticked_names()
    missing = [n for n in reg if n not in names]
    assert not missing, f"registered queries absent from COVERAGE.md: {missing}"


def test_multimodal_docstring_matches_decode_image_dispatch():
    """The r7 verdict caught the multimodal module docstring denying the
    JPEG support decode_image had just gained (the function-level doc was
    right, the module header was stale). Guard the dispatcher-scope
    sentence against the ACTUAL dispatch branches: every decoder
    decode_image calls must be named in the sentence, and the sentence
    must not claim a format decode_image doesn't dispatch."""
    import inspect

    from reddit_sentiment_spark_streaming_pipeline_spark.operators import multimodal

    src = inspect.getsource(multimodal.decode_image)
    body = src.split('"""')[2]  # strip def line + function docstring
    fmt_by_decoder = {
        "decode_png": "PNG",
        "decode_jpeg": "JPEG",
        "decode_pgm": "PGM",
        "decode_wav": "WAV",
        "decode_y4m": "Y4M",
    }
    dispatched = {
        f for d, f in fmt_by_decoder.items()
        if re.search(rf"\b{d}\(", body)
    }
    assert dispatched, "decode_image dispatches no known decoder?"
    m = re.search(r"`decode_image`\s+dispatches[^.]*\.", multimodal.__doc__)
    assert m, "module docstring lost its decode_image dispatcher sentence"
    sentence = m.group(0)
    for f in dispatched:
        assert f in sentence, (
            f"decode_image dispatches {f} but the module docstring's "
            f"dispatcher sentence does not mention it: {sentence!r}"
        )
    for f in set(fmt_by_decoder.values()) - dispatched:
        assert f not in sentence, (
            f"module docstring claims decode_image dispatches {f}, "
            f"but it does not: {sentence!r}"
        )


# --- rehearsal-claim drift guard -------------------------------------------
#
# r4 and r5 both shipped changelog bullets whose "N×" rehearsal numbers
# disagreed with the committed REHEARSAL_r*.json artifacts (the bullets were
# written from intermediate runs, then the artifact was re-committed). This
# guard parses every per-query "N×" claim in artifact-referencing COVERAGE.md
# bullets and checks it against the committed artifacts, so a claim that
# matches no committed measurement fails CI instead of shipping.
#
# Parsing rules (tuned to the doc's conventions, conservative by design —
# a skipped number is merely unchecked, never a false alarm):
#   * only top-level bullets that name a `REHEARSAL_r*.json` file are in
#     scope; claims are matched against the union of ALL committed artifacts
#     (bullets legitimately cross-reference the 30× deep point).
#   * a number is a claim when written `N×` (or decimal `N.Nx`); it is
#     SKIPPED when historical or derived: clause carries a history marker
#     (was/were/showed/shown/originally/claimed/cited/knee(s)/old
#     fixture/first run/intermediate/pre-*), number precedes
#     an `→` (the pre-fix side of A → B), or is prefixed by `~` `=` `≤` `≥`
#     `<` `>` or a range dash.
#   * "max wall N× (query" and "median wall N×" check the artifact's
#     max/argmax and median directly; other claims must match the wall or
#     shuffle ratio of a query named in the same bullet, or an artifact's
#     replica count (scale labels like "at 30×").

_ROOT = os.path.dirname(_DOC)

_HIST = re.compile(
    r"\b(was|were|showed|shown|originally|claimed|cited|knees?|old fixture|"
    r"first run|intermediate|pre-\w+)\b",
    re.I,
)
_NUM = re.compile(
    r"(?<![\d.\-~=≤≥<>])(\d+(?:\.\d+)?)×|(?<![\d.\-~=≤≥<>])(\d+\.\d+)x\b"
)


def _artifacts() -> list[dict]:
    import glob
    import json

    out = []
    for path in sorted(glob.glob(os.path.join(_ROOT, "REHEARSAL_*.json"))):
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(art, dict) and (
            "scaling_x" in art or "base" in art or "curve" in art
            # chaos artifacts nest their metric map under the scenario key
            or "gate" in art or "windowed" in art or "join" in art
            or "windows" in art or "stateful" in art
        ):
            out.append(art)
    return out


def _scalar_candidates(art: dict) -> set[float]:
    """Checkable RATIO numbers from artifacts without per-query scaling
    maps (e.g. the streaming-state rehearsal): only ratio-shaped fields
    (keys ending in `_x` / containing `scaling`) qualify — admitting every
    numeric scalar (state_partitions, n_batches, total_sec) would let a
    wrong N× claim coincidentally match a count and slip the guard."""
    def ratio_keys(d: dict) -> set[float]:
        return {
            float(v) for k, v in d.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            and (k.endswith("_x") or "scaling" in k)
        }

    vals = ratio_keys(art)
    # chaos/drain artifacts nest their metric maps one level down (e.g.
    # the gate chaos' control_late_vs_early_trigger_x lives under "gate");
    # the compaction chaos nests once more (windows.<crash_window>.*)
    for k in ("base", "big", "gate_base", "gate_big",
              "gate", "windowed", "join", "stateful", "windows"):
        sub = art.get(k)
        if isinstance(sub, dict):
            vals |= ratio_keys(sub)
            for v in sub.values():
                if isinstance(v, dict):
                    vals |= ratio_keys(v)
    # sweep artifacts (e.g. the compaction payoff) carry a `curve` list
    # of per-point dicts with ratio fields like speedup_x
    for entry in art.get("curve", []):
        if isinstance(entry, dict):
            vals |= ratio_keys(entry)
    return vals


def _close(claim: float, actual: float | None) -> bool:
    if actual is None:
        return False
    return abs(claim - actual) <= max(0.06, 0.005 * abs(actual))


def test_rehearsal_claims_match_committed_artifacts():
    arts = _artifacts()
    assert arts, "no committed REHEARSAL_*.json artifacts found"
    with open(_DOC) as f:
        text = f.read()
    reg = set(registry.load_all())
    bullets = re.split(r"\n(?=- |\#)", text)
    failures = []
    for bullet in bullets:
        if not re.search(r"REHEARSAL_r\w+\.json", bullet):
            continue
        mentioned = {n for n in reg if n in bullet}
        candidates = {
            float(a["replicas"]) for a in arts if "replicas" in a
        }
        for art in arts:
            if "scaling_x" not in art:
                candidates |= _scalar_candidates(art)
            for q in mentioned:
                for key in ("scaling_x", "shuffle_scaling_x"):
                    v = art.get(key, {}).get(q)
                    if v is not None:
                        candidates.add(float(v))
        # special claims first; blank them out so the plain pass skips them
        work = bullet
        for m in re.finditer(r"max wall ([\d.]+)× \(([a-z_]+)", work):
            claim, q = float(m.group(1)), m.group(2)
            ok = any(
                _close(claim, max(a["scaling_x"].values()))
                and max(a["scaling_x"], key=a["scaling_x"].get) == q
                for a in arts
                if a.get("scaling_x")
            )
            if not ok:
                failures.append(f"max-wall claim {claim}x ({q}) matches no artifact")
        work = re.sub(r"max wall [\d.]+× \([a-z_]+", "", work)
        for m in re.finditer(r"median wall ([\d.]+)×", work):
            claim = float(m.group(1))
            import statistics

            ok = any(
                _close(claim, statistics.median(a["scaling_x"].values()))
                for a in arts
                if a.get("scaling_x")
            )
            if not ok:
                failures.append(f"median-wall claim {claim}x matches no artifact")
        work = re.sub(r"median wall [\d.]+×", "", work)
        for clause in re.split(r"(?:\.\s|,\s)", work):
            if _HIST.search(clause):
                continue
            for m in _NUM.finditer(clause):
                if clause[m.end():].lstrip().startswith("→"):
                    continue  # pre-fix side of an A → B pair
                claim = float(m.group(1) or m.group(2))
                # "N× of linear" claims are ratios of the replica count
                checked = {claim}
                if clause[m.end():].lstrip("×x ").startswith("of linear"):
                    checked |= {
                        claim * float(a["replicas"])
                        for a in arts
                        if "replicas" in a
                    }
                if not any(
                    _close(c, cand) for c in checked for cand in candidates
                ):
                    failures.append(
                        f"claim {claim}x matches no committed artifact value "
                        f"(bullet queries={sorted(mentioned)}, "
                        f"clause={clause.strip()[:90]!r})"
                    )
    assert not failures, "\n".join(failures)
