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
    """The driver samples the first 50 oracled registrations; the tier
    frozensets steer that window, so a typo'd name or an over-full front
    section would silently leave queries unverified."""
    names = {q.name for q in reg.REGISTRY.values()}
    unknown = reg._NEW_THIS_ROUND - names
    assert not unknown, f"_NEW_THIS_ROUND references unknown queries: {unknown}"
    mods = {q.fn.__module__.rsplit(".", 1)[-1] for q in reg.REGISTRY.values()}
    missing_mods = reg._STALE_MODULES - mods
    assert not missing_mods, f"_STALE_MODULES references unknown modules: {missing_mods}"
    front = [
        q
        for q in reg.REGISTRY.values()
        if q.oracle is not None
        and (
            q.fn.__module__.rsplit(".", 1)[-1] in reg._STALE_MODULES
            or q.name in reg._NEW_THIS_ROUND
        )
    ]
    assert len(front) <= 50, (
        f"tier 0 + tier 1 hold {len(front)} oracled queries — more than the "
        f"driver's 50-query window; trim the tier lists"
    )
