"""Measure headline-query scaling between two sf dirs (default sf0.1 vs the
/tmp/sf1 replica built by tools/make_scaled_testdata.py).

Usage: python tools/scale_probe.py [small_dir] [big_dir]
Prints per-query min-warm wall times and the big/small ratio; anything
scaling much faster than its input-growth factor is a red flag (quadratic
candidate generation, driver-side loops, unsized shuffles).
"""
import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMALL = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BIG = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

NAMES = [
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue", "top_customers_by_spend",
    "latest_event_per_user", "purchase_asof_last_view", "user_sessions_gap30",
    "salted_brand_volume", "order_value_percentiles", "hourly_gap_interpolation",
    "docs_token_stats", "docs_chunk_dedup", "docs_minhash_neardup_pairs",
    "docs_neardup_clusters", "docs_pii_redaction", "docs_sequence_packing",
    "docs_repetition_filter", "weekly_report_sections",
    # r7 kernels (clustering / semantic dedup / multiprobe ANN / quality)
    "embeddings_kmeans_lloyd", "embeddings_semdedup_prune",
    "embeddings_knn_ivf_multiprobe", "docs_quality_classifier",
    # r8/r9 kernels (span dedup, shard assignment, tf-idf, SQ8 ANN, on-demand)
    "docs_dup_ngram_spans", "docs_dup_span_runs", "docs_shard_assignment",
    "docs_tfidf_topterms", "embeddings_sq8_adc_knn", "on_demand_farm_report",
    # r9 kernels (quality resampling, budgeted curation, DSIR, IVF-PQ,
    # survivor election, streaming dedup ledger)
    "docs_quality_bucket_sample", "docs_token_budget_curation",
    "docs_dsir_importance_sample", "embeddings_ivfpq_adc_knn",
    "docs_neardup_keep_best", "stream_incremental_dedup",
    "docs_vocab_hll_by_source", "docs_weighted_priority_sample",
    "docs_bpe_merge_candidates", "docs_dup_span_scrub",
    "docs_minhash_incremental_neardup", "docs_curation_funnel",
    "docs_token_cms_topk",
    # r10 kernels (6-stage funnel feeds the shard manifest, BPE trainer,
    # image perceptual-hash near-dup, two-stage IVF-PQ refine)
    "docs_curated_shard_manifest", "docs_bpe_train_merges",
    "multimodal_phash_neardup_pairs", "embeddings_ivfpq_refined_knn",
    "docs_leakage_safe_split", "docs_bpe_encode",
    "stream_windowed_event_counts", "embeddings_ivfpq_residual_knn",
    "docs_curation_funnel_by_source", "embeddings_ivfpq_multiprobe_knn",
    "docs_unigram_surprisal", "docs_source_capped_corpus",
    "event_funnel_conversion", "event_weekly_cohort_retention",
    # r11 kernels
    "embeddings_ann_recall_report", "multimodal_paired_neardup",
    # r12: the watermark-evicted dedup replay (state-SIZE curve lives in
    # tools/state_curve_probe.py; this row tracks wall-clock growth),
    # the curated epoch mix, and the curation x cohort composition
    "stream_dedup_watermark_evict", "docs_curated_epoch_mix",
    "docs_curation_by_engagement_cohort", "docs_decontaminate_bloom",
    "embeddings_knn_mmr_diversified", "docs_decontaminate_span_scrub",
    "multimodal_video_frame_neardup", "embeddings_ivf_incremental_drift",
    "docs_neardup_cluster_quality", "docs_hybrid_rrf_search",
    "docs_curated_epoch_shard_manifest",
    # r12 late kernels: embedding-space decontamination (IVF-cell-bounded)
    # and the two-phase distributed curriculum ranking
    "docs_decontaminate_semantic", "docs_curriculum_order",
    "docs_decontaminate_union_report", "multimodal_audio_fp_neardup",
    # r13 kernels: BM25 lexical tower, the four-method hybrid recall
    # report (brute-force gt is the declared quadratic witness), and the
    # at-ingest curation funnel replay (ledger growth curve lives in
    # tools/ledger_growth_probe.py; this row tracks wall-clock growth)
    "docs_bm25_topk", "docs_hybrid_recall_report",
    "stream_ingest_curation_funnel",
    # r14 kernels: ledger compaction (the SCALE.md policy as an operator)
    # and the reshaped oracle-checkable histogram-quantile sketch path
    "stream_ingest_ledger_compaction", "order_value_percentiles_approx",
    # r16 coverage closure (VERDICT r15 item 3): the non-trivial kernels
    # that were in neither bench.HEADLINE nor this table — the docs
    # dedup/fingerprint/lang-id/sampling/mix family plus the three
    # per-row multimodal decode kernels. Everything still outside both
    # lists now carries a named exclusion in SCALE.md ("Probe coverage
    # accounting").
    "docs_exact_dedup", "docs_fingerprint", "docs_simhash_neardup_pairs",
    "docs_ngram_jaccard_pairs", "docs_lang_id", "docs_stratified_hash_sample",
    "docs_training_mix_report", "docs_reservoir_per_source",
    "docs_bpe_token_count", "docs_mix_weighted_epochs",
    "docs_neardup_clusters_star", "docs_quality_by_source",
    "multimodal_blob_meta", "multimodal_frame_sample",
    "multimodal_resize_decode",
]

# Named probe exclusions (VERDICT r15 item 3): every registered query is
# either in bench.HEADLINE, in NAMES above, or carries an entry here with
# the reason it is deliberately not 10x-probed — enforced by
# tests/test_probe_coverage.py, so a new registration without a probe row
# fails the suite until it is measured or explicitly excluded.
#
# Reason grammar:
#   sibling:<measured row>  same plan skeleton (scan/shuffle/window shape)
#                           on the same growing table as a benched/probed
#                           row — its measured ratio is the family's.
#   subset:<measured row>   strict subset of a measured row's pipeline.
#   expr-only               scan -> project/filter (at most a bounded-
#                           cardinality group); no data-keyed shuffle, so
#                           growth IS the scan term the bench's trivial-
#                           scan control measures.
#   bounded-input           the data term is bounded by construction
#                           (API-page-sized decode input, dim-sized spine,
#                           #weeks/#chunks groups) — 10x facts do not
#                           reach the kernel.
#   stream-lifecycle        stages a real micro-batch replay; fixed
#                           lifecycle cost dominates wall-clock (the
#                           documented session-inflation class) and the
#                           state/data term is measured separately
#                           (stream_incremental_dedup / watermark-evict /
#                           ledger probes + state curves).
#   declared-baseline:<kernel>  labeled quadratic baseline whose pair term
#                           is already measured (the recall report's
#                           ground-truth witness row) and whose scale path
#                           is the named production kernel.
EXCLUDED = {
    # event-table window/agg family — measured via latest_event_per_user
    # (1.46x), user_sessions_gap30 (1.24x), purchase_asof_last_view (1.25x)
    "event_gaps_lag_lead": "sibling:user_sessions_gap30",
    "next_event_after_error": "sibling:user_sessions_gap30",
    "running_max_so_far": "sibling:user_sessions_gap30",
    "user_event_mode": "sibling:latest_event_per_user",
    "user_status_from_last_event": "sibling:latest_event_per_user",
    "last_value_before_cutoff": "sibling:latest_event_per_user",
    "latest_order_per_customer": "sibling:latest_event_per_user",
    # orders/lineitem bounded-group agg family — tpch_q1 measured 1.06x
    "avg_over_valid_only": "sibling:tpch_q1_pricing_summary",
    "conditional_agg_by_day": "sibling:tpch_q1_pricing_summary",
    "weighted_avg_price": "sibling:tpch_q1_pricing_summary",
    "two_stage_avg_of_daily_avgs": "sibling:tpch_q1_pricing_summary",
    "monthly_ratio_then_mean": "sibling:tpch_q1_pricing_summary",
    "totals_domain_rule": "sibling:tpch_q1_pricing_summary",
    "ytd_accumulation": "sibling:tpch_q1_pricing_summary",
    "scatter_2d_qty_discount": "sibling:tpch_q1_pricing_summary",
    "histogram_zero_fill": "sibling:tpch_q1_pricing_summary",
    "distinct_nation_segment": "sibling:tpch_q1_pricing_summary",
    "union_all_branches": "sibling:tpch_q1_pricing_summary",
    "include_exclude_rewrite": "sibling:tpch_q1_pricing_summary",
    "report_week_rollup": "sibling:tpch_q1_pricing_summary",
    "listagg_parts_by_brand": "sibling:tpch_q1_pricing_summary",
    "newline_template_block": "sibling:tpch_q1_pricing_summary",
    # multi-way join-then-agg family — tpch_q3 measured (2.46x, r15
    # adjudicated sublinear data-dependent work, identical plans)
    "agg_then_equijoin": "sibling:tpch_q3_shipping_priority",
    "quality_threshold_semijoin": "sibling:tpch_q3_shipping_priority",
    "customers_inactive_anti_join": "sibling:tpch_q3_shipping_priority",
    "customers_urgent_semi_join": "sibling:tpch_q3_shipping_priority",
    "dedup_union_keys": "sibling:tpch_q3_shipping_priority",
    "intersect_except_nations": "sibling:tpch_q3_shipping_priority",
    "sorted_pinned_tail_topk": "sibling:top_customers_by_spend",
    # bounded dim/band/spine joins — facts join a broadcast-sized side
    "order_value_band_join": "bounded-input",
    "daily_orders_calendar_spine": "bounded-input",
    # REST decode kernels — input is API-page-sized by construction;
    # the decode shape itself is benched (ncst_pivot_decode,
    # fcst_hourly_decode, mid_forecast_expand headline rows)
    "asos_daily_decode": "sibling:ncst_pivot_decode",
    "asos_hourly_decode": "sibling:ncst_pivot_decode",
    "weather_code_decode": "sibling:ncst_pivot_decode",
    "schedule_day_crosstab": "sibling:schedule_seq_filter_modes",
    "schedule_expansion": "sibling:schedule_seq_filter_modes",
    "schedule_farm_default": "sibling:schedule_seq_filter_modes",
    # per-row expression pipelines, no data-keyed shuffle
    "locale_view_date": "expr-only",
    "prefix_code_decode": "expr-only",
    "safe_numeric_parse": "expr-only",
    "sentinel_alive_culled": "expr-only",
    "string_date_roundtrip": "expr-only",
    "sha2_share_token": "expr-only",
    "json_props_extract": "expr-only",
    "lambert_grid_cells": "expr-only",
    # bounded-cardinality report shapes
    "chunked_wide_rows": "bounded-input",
    "weekly_report_summary": "subset:weekly_report_sections",
    # MERGE family — the write path is benched via merge_upsert_partial
    "cascade_delete_gate": "sibling:merge_upsert_partial",
    "merge_delete_then_insert": "sibling:merge_upsert_partial",
    "merge_insert_if_absent": "sibling:merge_upsert_partial",
    "surrogate_keys_dim": "sibling:merge_upsert_partial",
    # staged micro-batch replays (session-inflation policy)
    "staged_commit_retry": "stream-lifecycle",
    "stream_microbatch_upsert": "stream-lifecycle",
    # labeled quadratic baselines
    "embeddings_knn_bruteforce": "declared-baseline:embeddings_knn_ivf",
    "embeddings_cosine_neardup_pairs": (
        "declared-baseline:embeddings_cosine_neardup_bucketed"
    ),
}

# Optional comma-separated subset (probe only these names) — lets a round
# measure its new kernels without re-running the whole table.
_ONLY = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
if _ONLY:
    only = {n.strip() for n in _ONLY.split(",")}
    NAMES = [n for n in NAMES if n in only]


def main() -> None:
    from inspig_etl_spark import queries as reg
    from inspig_etl_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qmap = reg.queries()

    def run(sf_dir: str, name: str) -> float:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(min(times[1:]), 3)  # first pass warms; min of the rest

    out = {}
    for n in NAMES:
        if n not in qmap:
            continue
        a, b = run(SMALL, n), run(BIG, n)
        out[n] = {"small_s": a, "big_s": b, "ratio": round(b / a, 2)}
        print(f"{n:36s} {a:7.3f} -> {b:7.3f}  ratio {b / a:5.2f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
