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
