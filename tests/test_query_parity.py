"""Differential test: every registered query vs its DuckDB oracle.

This replicates the driver's correctness gate locally (sf0.01 — the same
scale the driver uses) so a red here means a red in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from inspig_etl_spark import queries as reg
from tests.conftest import SF_CORRECT
from tests.parity import compare, run_oracle

reg._load()
CASES = [q for q in reg.REGISTRY.values() if q.oracle is not None]
NO_ORACLE = [q for q in reg.REGISTRY.values() if q.oracle is None]


@pytest.mark.parametrize("case", CASES, ids=[c.name for c in CASES])
def test_query_matches_oracle(spark, case):
    df = case.fn(spark, SF_CORRECT)
    cols, rows = run_oracle(case.oracle, SF_CORRECT)
    compare(case.name, df, cols, rows)


@pytest.mark.parametrize(
    "case", NO_ORACLE or [None], ids=[c.name for c in NO_ORACLE] or ["none"]
)
def test_no_oracle_query_runs(spark, case):
    if case is None:
        pytest.skip("all queries have oracles")
    df = case.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_window_tier_lists_are_consistent():
    """The driver samples the first 50 registrations (rows-only queries get
    a record too — see CORRECTNESS_r03's multimodal rows); the tier
    frozensets steer that window, so a typo'd name or an over-full front
    section would silently leave queries unverified."""
    names = {q.name for q in reg.REGISTRY.values()}
    for label, tier_set in [
        ("_NEW_THIS_ROUND", reg._NEW_THIS_ROUND),
        ("_STALE_R5", reg._STALE_R5),
        ("_STALE_R5_DEFERRED", reg._STALE_R5_DEFERRED),
    ]:
        unknown = tier_set - names
        assert not unknown, f"{label} references unknown queries: {unknown}"
    assert not (reg._NEW_THIS_ROUND & reg._STALE_R5), "a query is in both tiers"
    assert not (reg._STALE_R5 & reg._STALE_R5_DEFERRED), (
        "a deferred query is still listed in _STALE_R5"
    )
    front = [
        q
        for q in reg.REGISTRY.values()
        if q.name in reg._STALE_R5 or q.name in reg._NEW_THIS_ROUND
    ]
    assert len(front) <= 50, (
        f"tier 0 + tier 1 hold {len(front)} queries — more than the "
        f"driver's 50-query window; trim the tier lists"
    )


def test_r7_window_holds_the_stale_records():
    """Judge r6 verdict item 1: after r7 every registry query's driver
    record must be ≤2 rounds old, so the 8 stalest records (7 r4-deferred +
    the never-checked rows-only approx query) must sit inside the first 50
    registrations."""
    must_rotate = {
        "embeddings_cosine_neardup_pairs",
        "embeddings_knn_bruteforce",
        "merge_insert_if_absent",
        "docs_mix_weighted_epochs",
        "schedule_farm_default",
        "string_date_roundtrip",
        "docs_fingerprint",
        "order_value_percentiles_approx",
    }
    window = set(list(reg.REGISTRY)[:50])
    missing = must_rotate - window
    assert not missing, f"stale queries outside the r7 window: {missing}"


def test_never_driver_verified_queries_sit_inside_window():
    """Any oracled query with no row in ANY CORRECTNESS_r*.json must be in
    the first 50 oracled registrations, else its oracle never gets a driver
    check (the r5 analytics_ext gap — see ADVICE r5)."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    records = list(root.glob("CORRECTNESS_r*.json"))
    if not records:
        pytest.skip("no driver correctness records present")
    seen: set[str] = set()
    for p in records:
        seen.update(json.loads(p.read_text()).keys())
    window = [q.name for q in reg.REGISTRY.values() if q.oracle is not None][:50]
    never = [
        q.name
        for q in reg.REGISTRY.values()
        if q.oracle is not None and q.name not in seen
    ]
    outside = [n for n in never if n not in window]
    assert not outside, (
        f"never-driver-verified oracled queries outside the 50-query window: "
        f"{outside} — rotate them into _NEW_THIS_ROUND"
    )
