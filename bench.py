"""Benchmark harness: run the headline queries at a given scale factor and
emit ONE machine-readable JSON line with per-query wall-times.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Execution is forced with a ``noop`` format write (full pipeline runs on the
executors, nothing is collected to the driver), so timings measure the real
plan — scan, shuffle, agg — not driver serialization.

Output (last line on stdout, bounded to ~1500 chars so the driver's
2000-char tail capture always parses it — see compact_stdout_record):
    {"metric": "headline_total", "value": <sum>, "unit": "sec",
     "queries": {<slowest queries that fit>}, "sf": 0.1,
     "n_queries": N, "host_factor": ..., "queries_omitted": M}
The COMPLETE per-query map, host controls, re-read adjudications, and
baseline deltas are written to BENCH_LOCAL.json every run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Outlier re-read trigger: a query reading above this multiple of its
# committed per-query floor gets one end-of-suite paired re-read (VERDICT
# r14 item 2). 2.0 so that EVERY reading that would breach the 2x perf
# gate carries an in-file control-stamped re-read — the gate's own
# adjudication evidence, not just the >2.5x blowouts. Env-overridable so
# the re-read path itself can be integration-tested (set 0 to force a
# re-read of every baselined query).
REREAD_THRESHOLD = float(os.environ.get("SPARK_GRAFT_REREAD_THRESHOLD", "2.0"))

# Representative slice of the registry: scan-heavy aggs, multi-way joins,
# window kernels, the as-of join, and (as they land) the LLM-pipeline ops.
# Names not present in the registry are skipped, so the bench never breaks
# while coverage grows.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "top_customers_by_spend",
    "latest_event_per_user",
    "purchase_asof_last_view",
    "weekly_delta_wow",
    "full_outer_diff_report",
    "docs_minhash_neardup_pairs",
    "docs_token_stats",
    "embeddings_knn_bucketed",
    "embeddings_knn_ivf",
    "user_sessions_gap30",
    "nearest_station_haversine",
    "merge_upsert_partial",
    "pivot_crosstab_zero_fill",
    "salted_brand_volume",
    "distinct_users_per_type_skewsafe",
    "weekly_report_sections",
    # round-3 additions: composed collector pipelines + S4 decode kernels
    "weather_pipeline_day",
    "productivity_pivot_save",
    "schedule_seq_filter_modes",
    "ncst_pivot_decode",
    "mid_forecast_expand",
    "docs_neardup_clusters",
    # round-5 additions: S3 forecast decode, bucketed cosine near-dup pairs,
    # Arrow-batched multimodal decode, decontamination, OLAP + time-series ext
    "fcst_hourly_decode",
    "fcst_daily_rollup",
    "embeddings_cosine_neardup_bucketed",
    "multimodal_decode_features",
    "docs_decontaminate_eval_overlap",
    "orders_priority_rollup",
    "order_value_percentiles",
    "hourly_gap_interpolation",
    # round-6 additions: Gopher-style repetition quality rules, pushdown /
    # promo-share TPC-H shapes, PII redaction, C4-style chunk dedup
    "docs_repetition_filter",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue",
    "docs_pii_redaction",
    "docs_chunk_dedup",
    "docs_sequence_packing",
    # round-7 additions: clustering / semantic-dedup / multi-probe ANN /
    # linear quality filter
    "embeddings_kmeans_lloyd",
    "embeddings_semdedup_prune",
    "embeddings_knn_ivf_multiprobe",
    "docs_quality_classifier",
    # round-8/9 additions: ExactSubstr span detection + merge, deterministic
    # shard assignment, TF-IDF top-terms, SQ8 quantized ANN scoring, and the
    # on-demand single-farm endpoint path
    "docs_dup_ngram_spans",
    "docs_dup_span_runs",
    "docs_shard_assignment",
    "docs_tfidf_topterms",
    "embeddings_sq8_adc_knn",
    "docs_quality_bucket_sample",
    "docs_token_budget_curation",
    "docs_dsir_importance_sample",
    "embeddings_ivfpq_adc_knn",
    "docs_vocab_hll_by_source",
    "docs_bpe_merge_candidates",
    "docs_token_cms_topk",
    # round-13 addition: the BM25 lexical tower (cheap, ~2 s at sf0.1; the
    # other two r13 kernels are SCALE.md-probed instead — the recall
    # report re-runs the brute-force ground-truth witness (~7 s x 3 runs
    # of session inflation) and the ingest funnel stages a real 4-trigger
    # stream (~20 s x 3), both the documented exclusion classes below)
    "docs_bm25_topk",
    # round-14 additions: both cheap plain plans (~0.5 s and ~1.1 s at
    # sf0.1) — the oracle-checkable histogram-quantile sketch path and the
    # ingest-ledger compaction accounting; bounds minted in the r14
    # baseline re-mint's protocol (same-day quiet-host run, see
    # BASELINE.md "Local per-query bench baseline")
    "order_value_percentiles_approx",
    "stream_ingest_ledger_compaction",
    # round-10 addition: image perceptual-hash near-dup (the other three
    # r10 kernels — shard manifest, BPE trainer, IVF-PQ refine, streaming
    # window — are SCALE.md-probed instead: composed/driver-loop/staged
    # pipelines whose session cost would inflate every reading after them,
    # same policy as on_demand_farm_report below)
    "multimodal_phash_neardup_pairs",
]

# Deliberately NOT in the bench (measured in SCALE.md's 10x probe instead):
# on_demand_farm_report is a one-farm subset of weekly_report_sections
# (already a headline row) at >10 s/run, and stream_incremental_dedup
# stages temp parquet through a real micro-batch stream — both would add
# ~50 s of session work per bench (3 runs each), and session length is the
# documented inflation mechanism for every reading after them (SCALE.md
# r8/r9 drift triages: in-session numbers drift up with query count while
# isolated floors stay at baseline). The bench is the BASELINE-comparison
# instrument; keeping it bounded keeps its ratios meaningful.


def compact_stdout_record(full: dict, limit: int = 1500) -> dict:
    """Bound the FINAL stdout line to ``limit`` serialized chars.

    The driver keeps only the last 2000 chars of the bench's combined
    output and JSON-parses the final line — r14's 59-query line grew past
    2000 chars, so the capture started mid-line and the official record
    came back ``parsed: null`` (VERDICT r14 item 1; r6 failed the same
    way). The contract keys (metric/value/unit/queries/sf) stay, but the
    per-query map is truncated FASTEST-FIRST until the line fits: the
    slowest queries are the informative ones, and the complete map always
    lives in BENCH_LOCAL.json. ``n_queries`` carries the true count and
    ``queries_omitted`` says how many were dropped from the line."""
    rec = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": dict(full["queries"]),
        "sf": full["sf"],
        "n_queries": len(full["queries"]),
        "host": full.get("host", {}),
    }
    if "host_factor" in full:
        rec["host_factor"] = full["host_factor"]
    if full.get("rereads"):
        rec["rereads"] = len(full["rereads"])

    def _size() -> int:
        return len(json.dumps(rec, separators=(",", ":")))

    by_time = sorted(rec["queries"], key=lambda n: rec["queries"][n])
    dropped = 0
    while _size() > limit and by_time:
        del rec["queries"][by_time.pop(0)]
        dropped += 1
        rec["queries_omitted"] = dropped
    if _size() > limit:
        # Irreducible floor breach: even with every query dropped the fixed
        # keys + host object exceed the driver's capture window (~200 chars
        # today, so this should never fire) — say so loudly instead of
        # silently re-introducing the r14 parsed=null failure, e.g. if a
        # future host-object field balloons the record (ADVICE r15).
        print(
            f"# WARNING compact_stdout_record irreducible size {_size()} "
            f"exceeds limit {limit}; driver tail capture may not parse",
            file=sys.stderr,
        )
    return rec


def reread_outliers(
    timings: dict[str, float], base: dict[str, float], threshold: float = 2.0
) -> list[str]:
    """Names whose measured time exceeds ``threshold`` x their committed
    baseline — candidates for the end-of-suite re-read (VERDICT r14
    item 2: the r14 record posted a 12.5x/9.1x/3.9x consecutive-slot trio
    that manual triage adjudicated as one host-contention burst; this
    turns that triage into protocol). Slowest-excess first."""
    flagged = [
        n
        for n, t in timings.items()
        if n in base and base[n] > 0 and t > threshold * base[n]
    ]
    return sorted(flagged, key=lambda n: timings[n] / base[n], reverse=True)


def host_factor(host: dict, host_baseline: dict) -> float | None:
    """Fold the four control readings against their idle-host references
    into ONE multiplicative host factor (geometric mean of the ratios) —
    the uniform inflation this session's conditions impose on every
    reading. Read headline ratios divided by it (SCALE.md 'Host controls
    in the bench record'). Returns None when no ratio is computable."""
    ratios = [
        r / b
        for rs, b in (
            (host.get("control_q1", []), host_baseline.get("control_q1")),
            (host.get("scan_floor", []), host_baseline.get("scan_floor")),
        )
        if b
        for r in rs
    ]
    if not ratios:
        return None
    factor = 1.0
    for r in ratios:
        factor *= r
    return round(factor ** (1.0 / len(ratios)), 3)


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    from inspig_etl_spark import queries as reg
    from inspig_etl_spark.session import get_spark

    spark = get_spark("inspig-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qmap = reg.queries()
    names = [n for n in HEADLINE if n in qmap]

    # Warm up the JVM (codegen, shuffle service, parquet footer reads) so
    # per-query timings measure the PLAN, not one-time session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).limit(1).count()

    # Host-condition controls (VERDICT r12 item 2): the same two references
    # tools/drift_probe.py uses — tpch_q1 (a real multi-agg plan) and a
    # trivial one-column scan+count (the floor any query pays; moves only
    # with host/IO conditions, never a plan). Measured at session start AND
    # end so a hot host shows up IN the official record instead of costing
    # a next-round triage: read each headline ratio against the control
    # ratio (control vs its committed baseline in BENCH_BASELINE.json) —
    # if the controls read 1.2x, a uniform 1.2x on untouched queries is
    # host, not plans. r6/r10/r11/r12 all paid that triage manually.
    lineitem = os.path.join(SF_DIR, "lineitem.parquet")

    def _trivial_scan(sp, _sf):
        return sp.read.parquet(lineitem).select("l_quantity").groupBy().count()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = qmap[name](spark, SF_DIR)
        # Full distributed execution, zero driver-side collection.
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        # Queries may persist() intermediates that feed self-joins; drop
        # them so one run's cache never skews the next one's timing.
        spark.catalog.clearCache()
        return el

    def _control_pair() -> tuple[float, float]:
        def _min3(fn) -> float:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            return round(min(ts), 3)

        return _min3(qmap["tpch_q1_pricing_summary"]), _min3(_trivial_scan)

    def _loadavg() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    load_start = _loadavg()
    ctl_q1_start, ctl_scan_start = _control_pair()

    # Pass 1 warms, pass 2 measures. The first execution of a pipeline pays
    # one-time JIT/codegen compilation (async C2 — back-to-back reruns still
    # race the compile queue, measured 3-5x inflation on trig-heavy kernels),
    # and that cost amortizes to zero on a long-running cluster job. A full
    # warm pass gives the compiler the whole rest of the pass to settle, so
    # pass 2 measures the steady-state cost of the PLAN — scan, shuffle,
    # agg — which is what a 100 TB run scales with.
    timings: dict[str, float] = {}
    for name in names:
        run_once(name)
    # Measurement: per query, two back-to-back runs, keeping the min. The
    # grouped order (not interleaved passes) keeps a query's generated
    # classes hot: with ~30 headline queries an interleaved pass walks the
    # whole list between a query's two runs, evicting its codegen from the
    # bounded compiled-class cache and re-paying C2 compilation — measured
    # 2.5x inflation on the trig-heavy haversine kernel, gone when the same
    # query runs consecutively (isolated probe: 6.8s cold, then 1.2/1.0/1.0).
    for name in names:
        a = run_once(name)
        b = run_once(name)
        timings[name] = min(a, b)

    # Tracked baseline (committed from the last judged round) → per-query
    # delta, so a plan regression is visible in this run's output without
    # cross-round archaeology. Only comparable at the baseline's SF.
    # ``queries`` holds the per-query MIN across the mint runs (the floor);
    # ``queries_median`` the per-query MEDIAN (VERDICT r14 item 5) — on
    # sub-second queries the min is a best-case floor any loaded host can
    # "miss" by multiples, so 2x adjudication reads against the median.
    base_queries: dict[str, float] = {}
    base_median: dict[str, float] = {}
    base_path = Path(_REPO) / "BENCH_BASELINE.json"
    sf = _sf_from_dir(SF_DIR)
    if base_path.exists():
        base = json.loads(base_path.read_text())
        if base.get("sf") == sf:
            base_queries = base.get("queries", {})
            base_median = base.get("queries_median", {})

    # End-of-suite outlier re-read (VERDICT r14 item 2): any query reading
    # >2x its committed floor (REREAD_THRESHOLD) gets ONE more paired
    # reading here, with a
    # fresh scan-floor control stamped beside it, and the official timing
    # takes the min of the readings — same convention as the per-query
    # min-of-2 above. A host-contention burst over a few consecutive slots
    # (r14's 12.5x/9.1x/3.9x trio) now clears itself inside the run it hit
    # instead of costing a next-round manual triage; a REAL plan
    # regression reproduces in the re-read and stays flagged, with the
    # control stamp proving the host was sane when it did.
    rereads: dict[str, dict[str, float]] = {}
    for name in reread_outliers(timings, base_queries, REREAD_THRESHOLD):
        t0 = time.perf_counter()
        _trivial_scan(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        ctl = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        again = round(min(run_once(name), run_once(name)), 3)
        rereads[name] = {
            "first": round(timings[name], 3),
            "reread": again,
            "scan_floor_at_reread": ctl,
        }
        timings[name] = min(timings[name], again)
        print(
            f"# reread {name}: {rereads[name]['first']:.3f}s -> {again:.3f}s "
            f"(scan floor {ctl:.3f}s, baseline {base_queries[name]:.3f}s)",
            file=sys.stderr,
        )

    deltas: dict[str, float] = {}
    for name in names:
        timings[name] = round(timings[name], 3)
        line = f"# {name}: {timings[name]:.3f}s"
        if name in base_queries:
            d = round(timings[name] - base_queries[name], 3)
            deltas[name] = d
            line += f" ({'+' if d >= 0 else ''}{d:.3f}s vs floor {base_queries[name]:.3f}s"
            if name in base_median:
                line += f", median {base_median[name]:.3f}s"
            line += ")"
        print(line, file=sys.stderr)

    ctl_q1_end, ctl_scan_end = _control_pair()
    load_end = _loadavg()
    host = {
        "load": [load_start, load_end],
        "control_q1": [ctl_q1_start, ctl_q1_end],
        "scan_floor": [ctl_scan_start, ctl_scan_end],
    }
    print(f"# host controls: {json.dumps(host, separators=(',', ':'))}", file=sys.stderr)

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "host": host,
    }
    full = dict(out)
    if rereads:
        full["rereads"] = rereads
    # Self-adjudication: when the committed baseline carries control
    # references (host_baseline, written from an idle-host run), fold the
    # four control readings into one host factor — the uniform inflation
    # this session's host conditions impose on EVERY reading. Headline
    # ratios should be read divided by it (measurement policy, SCALE.md).
    if base_path.exists():
        hb = json.loads(base_path.read_text()).get("host_baseline")
        hf = host_factor(host, hb) if hb else None
        if hf is not None:
            full["host_factor"] = hf
            print(f"# host_factor={hf}", file=sys.stderr)
    if base_queries:
        full["baseline_total"] = round(sum(base_queries.values()), 3)
        full["delta_vs_baseline"] = deltas
        print(
            f"# baseline_total={full['baseline_total']} "
            f"delta_total={round(sum(deltas.values()), 3)}",
            file=sys.stderr,
        )
    (Path(_REPO) / "BENCH_LOCAL.json").write_text(json.dumps(full, indent=1))
    # FINAL stdout line, bounded so the driver's 2000-char tail capture
    # always contains it whole (r6 and r14 both went parsed=null when the
    # per-query map outgrew the window). Full per-query record above.
    print(json.dumps(compact_stdout_record(full), separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
