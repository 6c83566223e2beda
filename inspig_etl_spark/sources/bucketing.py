"""Bucketed-table co-location: shuffle-free joins for repeated big-big keys
(SURVEY.md §2.3 J3's scale path; SCALE.md "co-locate joins via bucketing").

The reference joins its largest tables (TB_MODON ⋈ TB_MODON_WK, every
weekly run — ``/root/reference/src/weekly/data_loader.py:232-271``) inside
Oracle, which co-locates by index. The Spark-native equivalent for a join
that runs every pipeline execution is HASH BUCKETING: both tables are
written pre-partitioned into the same number of buckets on the join key,
so a sort-merge join reads bucket i against bucket i directly — no
Exchange on either side, on any run, forever. At 100 TB that converts the
single most expensive recurring shuffle into a scan.

Rules that make it work (all encoded here, all tested):

- both sides bucketed on the SAME columns into the SAME bucket count;
- ``sortBy`` the join key inside each bucket so the sort-merge join also
  skips the per-task sort;
- tables must be saved through the catalog (``saveAsTable``) — bucketing
  metadata lives in the table catalog, not in parquet files;
- one file per bucket per write task: repartition by the bucket key first
  so small-file explosion doesn't undo the benefit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    buckets: int,
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed catalog table on ``keys``.

    ``repartition(buckets, *keys)`` first: each write task then owns whole
    buckets, producing one file per (task, bucket) instead of one per
    (input partition, bucket) — the classic bucketing small-file trap.
    """
    writer = (
        df.repartition(buckets, *[df[k] for k in keys])
        .write.bucketBy(buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With both sides bucketed identically this plans as a sort-merge join
    whose children are bare scans — zero Exchange nodes (asserted in
    tests/test_bucketing.py). Requires ``spark.sql.sources.bucketing.enabled``
    (default true).
    """
    return spark.table(left_name).join(spark.table(right_name), list(keys), how)
