"""Scale-evidence map: one classified scale story per registered query.

The rehearsal artifacts (REHEARSAL_r*.json) measure shuffle/wall scaling
directly for the queries with the riskiest physical shapes. This tool
closes the loop for the REST of the registry: every registered query is
classified into exactly one evidence class, and `tests/
test_scale_evidence.py` asserts the map is complete and internally
consistent (sibling targets must be directly measured; zero-shuffle
claims are re-validated against live physical plans).

Classes:
- artifact      measured directly in a committed REHEARSAL_*.json
                (detected automatically — never hand-listed here);
- zero_shuffle  physical plan contains no Exchange: a pure map stage
                scales embarrassingly by construction;
- sibling       same physical shape as a measured query (the named
                sibling's artifact reading is the evidence);
- bounded_output every Exchange carries map-side-combined partials or
                final output bounded by group/key cardinality or filter
                survivors — never the raw input;
- dim_scale     operates on dimension tables (customer/nation/region/
                supplier) that grow far slower than facts by design —
                the same broadcast-side-stays-fixed property the
                relational fixture rehearses.

Run:  python tools/scale_evidence.py        # regenerates SCALE_EVIDENCE.md
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

# query -> (class, detail). `artifact`-class queries are detected from the
# committed artifacts and must NOT appear here.
CLASSIFIED: dict[str, tuple[str, str]] = {
    # --- zero_shuffle (validated live by tests/test_scale_evidence.py) --
    "bpe_token_counts": ("zero_shuffle", "regex tokenize + per-row count"),
    "doc_sentiment": ("zero_shuffle", "column-algebra scorer, map-only"),
    "doc_sentiment_udf": ("zero_shuffle", "Arrow pandas-UDF scorer, map-only"),
    "embedding_norms": ("zero_shuffle", "per-row vector norm"),
    "event_parse_filter_derive": ("zero_shuffle", "parse/filter/derive, map-only"),
    "latest_event": ("zero_shuffle", "global max via TakeOrderedAndProject"),
    "media_features": ("zero_shuffle", "per-row metadata features"),
    "media_frame_samples": ("zero_shuffle", "per-row frame sampling"),
    "refs_extract": ("zero_shuffle", "regexp_extract_all + per-row sizes"),
    "scalar_function_matrix": ("zero_shuffle", "scalar-function matrix, map-only"),
    "vader_sentiment_cases": ("zero_shuffle", "fixed case table through the scorer"),
    # --- siblings of directly-measured queries ------------------------
    "simhash_fingerprints": ("sibling", "payload_simhash_dups"),
    "embedding_rp_simhash_dups": ("sibling", "payload_simhash_dups"),
    # incremental_neardup_gate graduated from sibling(simhash_near_dups)
    # to artifact in r10: REHEARSAL_r10_neardup_twin_scale.json measures
    # it directly (shuffle 9.79x at 10x); the streaming gate's per-batch
    # cost (store-scan x broadcast batch, novel_against_store's
    # inversion) is measured by REHEARSAL_r10_chaos_neardup.json.
    "minhash_lsh_candidates": ("sibling", "minhash_near_dups"),
    "ngram_jaccard_pairs": ("sibling", "minhash_near_dups"),
    "containment_pairs": ("sibling", "minhash_near_dups"),
    "split_leakage_pairs": ("sibling", "minhash_near_dups"),
    "dedup_recall_eval": ("sibling", "minhash_near_dups (candidate path); the exact n-gram ground-truth side is a documented test-scale validator"),
    "ann_recall_eval": ("sibling", "cosine_topk (and ann_lsh_topk, both measured); the exact side is the documented test-scale baseline"),
    "ivf_cluster_sizes": ("sibling", "ivf_ann_topk"),
    "label_centroid_norms": ("sibling", "kmeans_refined_clusters"),
    "tfidf_word_stats": ("sibling", "tfidf_topk"),
    "tfidf_topk_mlpipe": ("sibling", "tfidf_topk"),
    "bpe_merge_pair_counts": ("sibling", "bigram_pmi_topk"),
    "stratified_sample_counts": ("sibling", "stratified_quota_sample"),
    "length_band_filter": ("sibling", "vocab_coverage_thresholds"),
    "dedup_keep_last": ("sibling", "exact_dup_groups"),
    # arrival-order twins: same physical shape as their id-order twins
    # (md5 keep-first window / banded chunk equi-join + Hamming verify)
    # with the order key widened by the 32-char arrival_seq — no new
    # exchange, no new join
    "arrival_order_exact_gate": ("sibling", "incremental_dedup_gate"),
    "arrival_order_neardup_gate": ("sibling", "incremental_neardup_gate"),
    "arrival_order_ingest_pipeline": ("sibling", "incremental_ingest_pipeline"),
    "doc_fingerprints": ("sibling", "exact_dup_groups"),
    "dedup_survivor_stats": ("sibling", "exact_dup_groups"),
    "windowed_subreddit_sentiment": ("sibling", "windowed_event_counts"),
    "windowed_vader_sentiment": ("sibling", "windowed_event_counts"),
    "rolling_sentiment_band": ("sibling", "window_function_matrix"),
    "per_source_top_docs": ("sibling", "window_function_matrix"),
    "wire_posts_vader": ("sibling", "doc_sentiment_vader"),
    "pgm_decode_stats": ("sibling", "image_dhash_matches"),
    "png_decode_stats": ("sibling", "image_dhash_matches"),
    "jpeg_decode_stats": ("sibling", "image_dhash_matches"),
    "wav_decode_stats": ("sibling", "audio_fingerprint_matches"),
    "y4m_frame_stats": ("sibling", "dup_frame_groups"),
    "regional_customer_value": ("sibling", "q5_local_supplier_volume"),
    "promo_revenue_share": ("sibling", "q1_pricing_summary"),
    "customers_with_orders_semi": ("sibling", "q3_shipping_priority"),
    "customers_without_orders_anti": ("sibling", "q3_shipping_priority"),
    "merge_upsert_orders": ("sibling", "q18_large_volume_orders"),
    "sql_surface_order_priorities": ("sibling", "grouping_sets_order_stats"),
    # --- bounded_output -----------------------------------------------
    "event_stats_approx": ("bounded_output", "HLL++ sketch partials per event_type"),
    "event_avg_value": ("bounded_output", "single global avg partial per partition"),
    "event_time_range": ("bounded_output", "global min/max partials"),
    "avg_sentiment_global": ("bounded_output", "global avg partials"),
    "avg_sentiment_by_lang": ("bounded_output", "partials keyed by lang (~5 groups)"),
    "top3_event_types": ("bounded_output", "per-type counts then top-3"),
    "doc_source_stats": ("bounded_output", "partials keyed by source"),
    "incremental_agg_merge": ("bounded_output", "partial-state merge rows, one per (partition, group)"),
    "mixture_weights": ("bounded_output", "label-count partials, one row per label"),
    "media_metadata_stats": ("bounded_output", "metadata partials per media kind; payload never read"),
    "wire_quality_report": ("bounded_output", "malformed/ok counters per source"),
    "lsh_bucket_histogram": ("bounded_output", "bucket-size histogram partials"),
    "dq_expectations": ("bounded_output", "one conditional-aggregate pass per table + counted anti-join; output = expectation rows"),
    "refs_rollup": ("bounded_output", "single-pass ROLLUP partials keyed by (day, grouping)"),
    "union_dedup_activity": ("bounded_output", "two-key activity counts after union"),
    "order_count_histogram": ("bounded_output", "per-count histogram of per-customer counts"),
    "filter_funnel": ("bounded_output", "one counter row per funnel stage"),
    "timeframe_filter": ("bounded_output", "exchange carries only filter survivors (range partition for the output sort)"),
    "membership_filter": ("bounded_output", "exchange carries only membership survivors"),
    "posts_batch_result_tables": ("bounded_output", "per-micro-batch aggregates; the drain itself is measured in REHEARSAL_r06_streaming.json"),
    "jdbc_roundtrip_orders": ("bounded_output", "partition-parallel sink write; exchange is the verification aggregate"),
    "jsonl_roundtrip_events": ("bounded_output", "same"),
    "csv_roundtrip_orders": ("bounded_output", "same"),
    "orc_roundtrip_lineitem": ("bounded_output", "same"),
    # --- dim_scale ------------------------------------------------------
    "nation_customer_supplier_full_outer": ("dim_scale", "dims only; grows with dimensions, not facts"),
    "set_ops_customer_cohorts": ("dim_scale", "INTERSECT/EXCEPT distincts over customer cohorts"),
}


def artifact_queries() -> set[str]:
    """REGISTERED query names directly measured in any committed
    REHEARSAL_*.json.

    The streaming/stateful artifacts reuse the ``base``/``big`` keys for
    metric maps (total_sec, rows_drained, ...), so the harvest is
    intersected with the live registry — otherwise those metric names
    would be admitted as "directly measured queries", silently weakening
    the sibling-integrity and shadowing guards in
    tests/test_scale_evidence.py."""
    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    registered = set(registry.load_all())
    names = set()
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "REHEARSAL_*.json"))):
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, ValueError):
            continue
        for key in ("scaling_x", "shuffle_scaling_x", "base", "big"):
            v = art.get(key)
            if isinstance(v, dict):
                names |= {
                    k for k, vv in v.items() if isinstance(vv, (dict, int, float))
                }
    return names & registered


def build_map() -> dict[str, tuple[str, str]]:
    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    reg = registry.load_all()
    arts = artifact_queries()
    out: dict[str, tuple[str, str]] = {}
    for name in reg:
        if name in arts:
            out[name] = ("artifact", "measured directly")
        elif name in CLASSIFIED:
            out[name] = CLASSIFIED[name]
        else:
            out[name] = ("UNCLASSIFIED", "")
    return out


def main() -> None:
    m = build_map()
    lines = [
        "# Scale evidence map",
        "",
        "Generated by `tools/scale_evidence.py`; consistency is enforced by",
        "`tests/test_scale_evidence.py` (every registered query classified,",
        "sibling targets directly measured, zero-shuffle claims re-validated",
        "against live physical plans, and every artifact row PINNED to the",
        "query fingerprint its artifact actually measured — embedded in the",
        "artifact at run time, or reconstructed from its adding commit by",
        "`tools/pin_scale_evidence.py` — so a plan rewrite fails the build",
        "until its rehearsal is re-run). Classes: **artifact** = measured in a",
        "committed `REHEARSAL_*.json`; **zero_shuffle** = no Exchange in the",
        "physical plan; **sibling** = same physical shape as the named",
        "measured query; **bounded_output** = exchanges carry only partials/",
        "output bounded by group cardinality or survivors; **dim_scale** =",
        "dimension-table-sized by design.",
        "",
        "| query | class | evidence |",
        "|---|---|---|",
    ]
    for name in sorted(m):
        cls, detail = m[name]
        lines.append(f"| `{name}` | {cls} | {detail} |")
    with open(os.path.join(_REPO_ROOT, "SCALE_EVIDENCE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    counts: dict[str, int] = {}
    for cls, _ in m.values():
        counts[cls] = counts.get(cls, 0) + 1
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
