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
# The driver's correctness gate samples the first 50 registrations — mirror
# exactly that slice with one parametrized test per query (granular, runs
# first in the suite), and run the REMAINING oracled registry through one
# bulk thread-pool sweep (r17, VERDICT r16 item 2: the 169 sequential
# parametrized cases were ~12 min of driver-bound plan builds; the bulk
# form covers the same pairs in a fraction and still names every
# diverging query in its failure message).
WINDOW = set(list(reg.REGISTRY)[:50])
WINDOW_CASES = [q for q in CASES if q.name in WINDOW]
REST_NAMES = [q.name for q in CASES if q.name not in WINDOW]


@pytest.mark.parametrize("case", WINDOW_CASES, ids=[c.name for c in WINDOW_CASES])
def test_query_matches_oracle(spark, case):
    df = case.fn(spark, SF_CORRECT)
    cols, rows = run_oracle(case.oracle, SF_CORRECT)
    compare(case.name, df, cols, rows)


def test_queries_outside_window_match_oracle(spark):
    from tests.parity import sweep

    failures = sweep(spark, SF_CORRECT, REST_NAMES)
    assert not failures, (
        f"{len(failures)} queries diverge from their oracles at sf0.01:\n"
        + "\n".join(failures)
    )


@pytest.mark.parametrize(
    "case", NO_ORACLE or [None], ids=[c.name for c in NO_ORACLE] or ["none"]
)
def test_no_oracle_query_runs(spark, case):
    if case is None:
        pytest.skip("all queries have oracles")
    df = case.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_window_is_sorted_by_record_staleness():
    """The registry must be stable-sorted by the two-class recheck key
    (VERDICT r16 item 1): queries needing a re-check first (never verified,
    or CODE_TOUCHED after their last green record), then the rest; each
    class ascending by latest green round. A non-monotone key sequence
    means someone re-introduced manual ordering or broke
    ``_reorder_for_window``."""
    latest = reg.driver_verified_rounds()
    keys = [
        (not reg.needs_recheck(name, latest), latest.get(name, -1))
        for name in reg.REGISTRY
    ]
    assert keys == sorted(keys), (
        "registry is not sorted by the recheck/staleness key; "
        f"first inversion near {[n for n in reg.REGISTRY][:5]}"
    )


def test_code_touched_queries_sit_inside_window():
    """Every query whose code was touched after its latest driver-green
    record (CODE_TOUCHED) must be in the driver's 50-query window — the
    whole point of the r17 rotation change: a reshaped kernel re-verifies
    before anything merely stale."""
    latest = reg.driver_verified_rounds()
    if not latest:
        pytest.skip("no driver correctness records present")
    window = set(list(reg.REGISTRY)[:50])
    pending = [
        n
        for n in reg.CODE_TOUCHED
        if n in reg.REGISTRY and reg.needs_recheck(n, latest)
    ]
    outside = [n for n in pending if n not in window]
    assert not outside, (
        f"code-touched-but-unverified queries outside the window: {outside}"
    )


def test_never_driver_verified_queries_sit_inside_window():
    """Any query with no driver-green record in ANY CORRECTNESS_r*.json
    must be in the first 50 registrations, else its oracle never gets a
    driver check (the r5 analytics_ext gap and the r8 four-kernel gap).
    With the mechanical sort this can only fail if >50 queries are
    never-verified at once — which is itself worth failing on."""
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    if not list(root.glob("CORRECTNESS_r*.json")):
        pytest.skip("no driver correctness records present")
    latest = reg.driver_verified_rounds()
    window = list(reg.REGISTRY)[:50]
    never = [name for name in reg.REGISTRY if name not in latest]
    outside = [n for n in never if n not in window]
    assert not outside, (
        f"never-driver-verified queries outside the 50-query window: "
        f"{outside} — more than 50 unverified queries pending?"
    )


def test_stalest_records_sit_inside_window():
    """Among queries NOT needing a re-check, no query outside the 50-query
    window may have a staler record than any such query inside it (the r8
    invariant, restricted to the non-priority class — recheck-class
    queries legitimately jump the staleness queue)."""
    latest = reg.driver_verified_rounds()
    if not latest:
        pytest.skip("no driver correctness records present")
    names = list(reg.REGISTRY)
    inside = [
        latest.get(n, -1)
        for n in names[:50]
        if not reg.needs_recheck(n, latest)
    ]
    outside = [
        latest.get(n, -1)
        for n in names[50:]
        if not reg.needs_recheck(n, latest)
    ]
    if inside and outside:
        assert max(inside) <= min(outside), (
            f"window holds a fresher record (r{max(inside)}) than one left "
            f"outside (r{min(outside)})"
        )
