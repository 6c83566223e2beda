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
]

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
