"""Query registry: every implemented operator from SURVEY.md §2, declared as a
(DataFrame query, DuckDB oracle SQL) pair.

The driver's correctness gate runs each pair side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash, so:

- every aggregate/computed column is aliased identically on both sides;
- every floating-point aggregate goes through an exact DecimalType
  intermediate (see ``functions/rounding.py``) so results are
  order-independent and bit-identical across engines;
- queries with no ANSI-SQL equivalent (hash-dependent LSH sketches,
  streaming) register ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    operators: str  # SURVEY.md §2 operator ids this query exercises


REGISTRY: dict[str, Query] = {}


def register(name: str, operators: str, oracle: str | None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, operators=operators)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import all query modules (each registers into REGISTRY).

    Import order IS registration order, and the driver's correctness gate
    samples the first 50 oracled registrations — so the window is rotated
    each round onto the queries with the stalest driver record via the
    explicit priority tiers below (import order alone no longer controls
    it). Round 6, tier 0: the queries that have NEVER been driver-verified
    (the 3 analytics_ext queries added after the r5 window froze, plus the
    6 added in r6: docs_repetition_filter, tpch_q6/q14, docs_pii_redaction,
    docs_chunk_dedup, docs_sequence_packing); tier 1: the r04-verified cohort
    (48 queries minus seven sibling-covered deferrals, see
    _STALE_R4_DEFERRED); tier 2: everything
    r05-verified. ``test_window_tier_lists_are_consistent``
    enforces the ≤50 budget and ``test_never_driver_verified_queries_sit_
    inside_window`` that every never-driver-verified oracled query sits
    inside the window.
    """
    global _LOADED
    if _LOADED:
        return
    from inspig_etl_spark.queries import (  # noqa: F401
        tpch,
        aggregates,
        domain_aggs,
        event_log,
        joins,
        multimodal,
        weather_ingest,
        st_manifest,
        llm_similarity,
        geo,
        pivots,
        scalar_funcs,
        sessions,
        sinks_merge,
        skew,
        status_schedule,
        weekly_report,
        schedule_ext,
        weather_pipeline,
        productivity,
        llm_sampling,
        llm_text,
        llm_dedup,
        analytics_ext,
    )

    _reorder_for_window()
    _LOADED = True


# Tier 0: oracled queries with NO driver record at all (added after the r5
# window froze) — these must land in the window this round.
_NEW_THIS_ROUND = frozenset(
    {
        "orders_priority_rollup",
        "order_value_percentiles",
        "hourly_gap_interpolation",
        "docs_repetition_filter",  # added in r6
        "tpch_q6_forecast_revenue",  # added in r6
        "tpch_q14_promo_revenue",  # added in r6
        "docs_pii_redaction",  # added in r6
        "docs_chunk_dedup",  # added in r6
        "docs_sequence_packing",  # added in r6
    }
)

# Tier 1: the cohort last driver-verified in r04 (everything r05-verified is
# fresher and waits in tier 2). 48 queries qualify but only 41 slots remain
# after tier 0 took 9; seven are deferred to r7, each picked for strongest
# sibling coverage inside this window:
# - embeddings_cosine_neardup_pairs (bucketed sibling — same cosine kernel —
#   was r5-verified) and embeddings_knn_bruteforce (knn_bucketed + knn_ivf
#   siblings in-window exercise the same normalized-dot-product kernel);
# - merge_insert_if_absent (merge_upsert_partial + merge_delete_then_insert
#   in-window cover the same MERGE sink kernel);
# - docs_mix_weighted_epochs (stratified_hash_sample + reservoir_per_source
#   in-window cover the same hash-gated sampling kernel);
# - schedule_farm_default (schedule_expansion + schedule_seq_filter_modes
#   in-window cover the same UDTF expansion kernel);
# - string_date_roundtrip (locale_view_date + safe_numeric_parse in-window
#   cover the scalar date/parse family);
# - docs_fingerprint (docs_exact_dedup in-window exercises the same
#   md5-hash canonicalize/groupBy kernel).
_STALE_R4_DEFERRED = frozenset(
    {
        "embeddings_cosine_neardup_pairs",
        "embeddings_knn_bruteforce",
        "merge_insert_if_absent",
        "docs_mix_weighted_epochs",
        "schedule_farm_default",
        "string_date_roundtrip",
        "docs_fingerprint",
    }
)
_STALE_R4 = frozenset(
    {
        "multimodal_blob_meta",
        "ncst_pivot_decode",
        "mid_forecast_expand",
        "embeddings_knn_bucketed",
        "embeddings_knn_ivf",
        "nearest_station_haversine",
        "lambert_grid_cells",
        "pivot_crosstab_zero_fill",
        "chunked_wide_rows",
        "sentinel_alive_culled",
        "prefix_code_decode",
        "safe_numeric_parse",
        "locale_view_date",
        "report_week_rollup",
        "user_sessions_gap30",
        "merge_upsert_partial",
        "merge_delete_then_insert",
        "surrogate_keys_dim",
        "cascade_delete_gate",
        "salted_brand_volume",
        "distinct_users_per_type_skewsafe",
        "user_status_from_last_event",
        "schedule_expansion",
        "schedule_day_crosstab",
        "weekly_report_sections",
        "weekly_report_summary",
        "schedule_seq_filter_modes",
        "weather_pipeline_day",
        "weather_code_decode",
        "productivity_pivot_save",
        "docs_stratified_hash_sample",
        "docs_reservoir_per_source",
        "docs_exact_dedup",
        "docs_token_stats",
        "docs_quality_by_source",
        "docs_lang_id",
        "docs_bpe_token_count",
        "docs_ngram_jaccard_pairs",
        "docs_minhash_neardup_pairs",
        "docs_simhash_neardup_pairs",
        "docs_neardup_clusters",
    }
)


def _reorder_for_window() -> None:
    """Stable-sort the registry into verification-priority tiers (the sort
    keeps registration order within a tier)."""

    def tier(q: Query) -> int:
        if q.name in _NEW_THIS_ROUND:
            return 0
        if q.name in _STALE_R4:
            return 1
        return 2

    ordered = sorted(REGISTRY.values(), key=tier)
    REGISTRY.clear()
    REGISTRY.update({q.name: q for q in ordered})
