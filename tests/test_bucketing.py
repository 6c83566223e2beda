"""Bucketed co-located join: prove the shuffle actually disappears.

The assertion here is the PLAN, not just the rows: joining two tables
bucketed identically on the join key must produce zero Exchange nodes —
that is the entire point of bucketing at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inspig_etl_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v_l")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("v_r")
    )
    write_bucketed(left, "bkt_left", ["k"], buckets=8, path=str(tmp_path / "l"))
    write_bucketed(right, "bkt_right", ["k"], buckets=8, path=str(tmp_path / "r"))
    yield "bkt_left", "bkt_right"
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_join_has_no_exchange_and_right_rows(bucketed_tables, spark):
    ln, rn = bucketed_tables
    # Force the sort-merge path (broadcast would hide the co-location).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, ln, rn, ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # Bucket-local sort order also satisfies the SMJ: no extra Sort
        # beyond the scan output is required, but we only pin the Exchange.
        assert joined.count() == len(range(0, 10_000, 3))
        one = joined.where(F.col("k") == 9).collect()
        assert one and one[0].v_l == 9 % 7 and one[0].v_r == 9 % 11
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_same_join_does_shuffle(bucketed_tables, spark):
    """Control: the identical join over plain DataFrames plans Exchanges —
    the zero-Exchange plan above is bucketing, not some session default."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 10_000).select(F.col("id").alias("k"))
        right = spark.range(0, 10_000, 3).select(F.col("id").alias("k"))
        plan = (
            left.join(right, "k")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_one_file_per_bucket(bucketed_tables, spark, tmp_path):
    files = [
        p for p in (tmp_path / "l").iterdir() if p.name.endswith(".parquet")
    ]
    # repartition(buckets, key) before bucketBy -> one file per bucket.
    assert len(files) == 8, sorted(p.name for p in files)
