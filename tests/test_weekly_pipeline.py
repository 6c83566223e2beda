"""Weekly-report pipeline tests: wide-row schema contract, zero-fill/NULL
semantics, and idempotent partition-overwrite re-runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inspig_etl_spark.pipelines.weekly import (
    N_WIDE,
    build_weekly_report,
    wide_row_columns,
)
from inspig_etl_spark.sources.sinks import overwrite_partitions
from tests.conftest import SF_SMOKE


def test_wide_row_schema_contract(spark):
    wide, _ = build_weekly_report(spark, SF_SMOKE, master_seq=7)
    assert wide.columns == wide_row_columns()
    assert len(wide.columns) == 7 + 3 * N_WIDE
    rows = wide.collect()
    assert all(r.master_seq == 7 for r in rows)
    # Herd section zero-fills counts; chart section keeps NULL no-data days.
    md = [r for r in rows if r.gubun == "MD"]
    sh = [r for r in rows if r.gubun == "SH"]
    assert md and sh
    assert all(r.cnt_1 is not None for r in md)
    assert all(r.cnt_15 is None and r.val_15 is None and r.str_15 is None for r in rows)
    # Deterministic ordering keys: each farm has status sort_nos 1..7 and
    # chart sort_nos 1..7.
    per_farm = {}
    for r in md:
        per_farm.setdefault(r.farm_no, set()).add(r.sort_no)
    assert all(v == set(range(1, 8)) for v in per_farm.values())


def test_idempotent_rerun_overwrites_slice(spark, tmp_path):
    path = str(tmp_path / "week_sub")
    wide, _ = build_weekly_report(spark, SF_SMOKE, master_seq=1)
    overwrite_partitions(wide, path, ["master_seq", "farm_no"])
    first = spark.read.parquet(path).count()

    # Re-run of the same master: same slice replaced, not duplicated.
    wide2, _ = build_weekly_report(spark, SF_SMOKE, master_seq=1)
    overwrite_partitions(wide2, path, ["master_seq", "farm_no"])
    assert spark.read.parquet(path).count() == first

    # A second master lands beside the first.
    wide3, _ = build_weekly_report(spark, SF_SMOKE, master_seq=2)
    overwrite_partitions(wide3, path, ["master_seq", "farm_no"])
    total = spark.read.parquet(path)
    assert total.count() == 2 * first
    assert total.select("master_seq").distinct().count() == 2


def test_summary_one_row_per_farm(spark):
    _, summary = build_weekly_report(spark, SF_SMOKE)
    rows = summary.collect()
    farms = [r.farm_no for r in rows]
    assert len(farms) == len(set(farms))
    assert all(r.total_users > 0 for r in rows)
    assert all(
        r.pregnant_cnt + r.nursing_cnt <= r.total_users for r in rows
    )
