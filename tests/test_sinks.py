"""Round-trip tests for the physical write path: dynamic partition
overwrite, staged atomic swap, read-or-empty bootstrap, surrogate keys.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from inspig_etl_spark.sources.sinks import (
    merge_upsert,
    overwrite_partitions,
    read_or_empty,
    staged_overwrite,
    with_surrogate_key,
)

SCHEMA = "day STRING, k INT, v DOUBLE"


def _rows(df):
    return sorted((r.day, r.k, r.v) for r in df.collect())


def test_overwrite_partitions_touches_only_new_partitions(spark, tmp_path):
    path = str(tmp_path / "sink")
    base = spark.createDataFrame(
        [("d1", 1, 1.0), ("d1", 2, 2.0), ("d2", 3, 3.0)], SCHEMA
    )
    base.write.partitionBy("day").parquet(path)

    # Re-run of the d1 slice only: d2 must survive untouched.
    redo = spark.createDataFrame([("d1", 9, 9.0)], SCHEMA)
    overwrite_partitions(redo, path, ["day"])
    got = spark.read.parquet(path).select("day", "k", "v")
    assert _rows(got) == [("d1", 9, 9.0), ("d2", 3, 3.0)]

    # Idempotent: same write again -> same state.
    overwrite_partitions(redo, path, ["day"])
    assert _rows(spark.read.parquet(path).select("day", "k", "v")) == [
        ("d1", 9, 9.0),
        ("d2", 3, 3.0),
    ]


def test_staged_overwrite_all_or_nothing(spark, tmp_path):
    path = str(tmp_path / "table")
    v1 = spark.createDataFrame([("d1", 1, 1.0)], SCHEMA)
    staged_overwrite(spark, v1, path)
    assert _rows(spark.read.parquet(path)) == [("d1", 1, 1.0)]

    # Successful replace swaps atomically.
    v2 = spark.createDataFrame([("d2", 2, 2.0)], SCHEMA)
    staged_overwrite(spark, v2, path)
    assert _rows(spark.read.parquet(path)) == [("d2", 2, 2.0)]

    # Failing job leaves the live table untouched (ST3: refuse partial).
    bad = spark.createDataFrame([("d3", 3, 3.0)], SCHEMA).withColumn(
        "v", F.raise_error(F.lit("boom")).cast("double")
    )
    with pytest.raises(Exception, match="boom"):
        staged_overwrite(spark, bad.select("day", "k", "v"), path)
    assert _rows(spark.read.parquet(path)) == [("d2", 2, 2.0)]
    # No staging/backup garbage left behind.
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "__staging" in d or "__old" in d] == []


def test_staged_overwrite_restores_live_table_on_failed_swap(
    spark, tmp_path, monkeypatch
):
    """If the staging→live rename fails AFTER the live table was moved to
    backup, the backup (then the only copy) must be restored, not deleted."""
    import inspig_etl_spark.sources.sinks as sinks_mod

    path = str(tmp_path / "table")
    v1 = spark.createDataFrame([("d1", 1, 1.0)], SCHEMA)
    staged_overwrite(spark, v1, path)

    real_rename = os.rename

    def failing_swap(src, dst):
        if dst == path and "__staging" in src:
            raise OSError("simulated swap failure")
        return real_rename(src, dst)

    monkeypatch.setattr(sinks_mod.os, "rename", failing_swap)
    v2 = spark.createDataFrame([("d2", 2, 2.0)], SCHEMA)
    with pytest.raises(OSError, match="simulated swap failure"):
        staged_overwrite(spark, v2, path)
    monkeypatch.undo()

    assert _rows(spark.read.parquet(path)) == [("d1", 1, 1.0)]
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "__staging" in d or "__old" in d] == []


def test_read_or_empty_bootstrap_and_merge_cycle(spark, tmp_path):
    """First-run bootstrap -> merge -> write -> merge again (ST1 shape)."""
    path = str(tmp_path / "incr")
    state = read_or_empty(spark, path, SCHEMA)
    assert state.count() == 0

    batch1 = spark.createDataFrame([("d1", 1, 1.0), ("d1", 2, 2.0)], SCHEMA)
    staged_overwrite(spark, merge_upsert(state, batch1, ["day", "k"]), path)

    batch2 = spark.createDataFrame([("d1", 2, 20.0), ("d2", 3, 3.0)], SCHEMA)
    state = read_or_empty(spark, path, SCHEMA)
    staged_overwrite(spark, merge_upsert(state, batch2, ["day", "k"]), path)

    assert _rows(spark.read.parquet(path)) == [
        ("d1", 1, 1.0),
        ("d1", 2, 20.0),
        ("d2", 3, 3.0),
    ]


def test_with_surrogate_key_deterministic(spark):
    df = spark.createDataFrame([("b", 2), ("a", 1), ("c", 3)], "nm STRING, x INT")
    out1 = {r.nm: r.sk for r in with_surrogate_key(df, "sk", ["nm"]).collect()}
    out2 = {r.nm: r.sk for r in with_surrogate_key(df, "sk", ["nm"], start=100).collect()}
    assert out1 == {"a": 1, "b": 2, "c": 3}
    assert out2 == {"a": 100, "b": 101, "c": 102}


def test_align_schemas_adds_typed_nulls_and_rejects_extras(spark):
    from inspig_etl_spark.sources.sinks import align_schemas, merge_upsert

    sink = spark.createDataFrame(
        [(1, 10.0, "x")], "k int, v double, note string"
    )
    old_batch = spark.createDataFrame([(1, 20.0), (2, 30.0)], "k int, v double")
    aligned = align_schemas(old_batch, sink)
    assert aligned.columns == ["k", "v", "note"]
    merged = {r.k: (r.v, r.note) for r in merge_upsert(sink, aligned, ["k"]).collect()}
    assert merged == {1: (20.0, None), 2: (30.0, None)}

    import pytest

    rogue = spark.createDataFrame([(1, 1.0, 9)], "k int, v double, rogue int")
    with pytest.raises(ValueError, match="rogue"):
        align_schemas(rogue, sink)
    assert align_schemas(rogue, sink, allow_extra=True).columns == ["k", "v", "note"]


def test_compact_reduces_files_atomically(spark, tmp_path):
    import os

    from inspig_etl_spark.sources.sinks import compact

    path = str(tmp_path / "sink")
    spark.range(1000).repartition(16).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 16
    compact(spark, path, target_partitions=2)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after <= 2
    assert spark.read.parquet(path).count() == 1000


def test_partition_predicate_guards_row_grain_keys(spark, monkeypatch):
    """A mis-keyed partition_by (row-grain column) must fail fast instead of
    collecting the whole key set to the driver (VERDICT r5 guard)."""
    import pytest

    from inspig_etl_spark.sources import sinks

    monkeypatch.setattr(sinks, "MAX_COLLECTED_PARTITIONS", 10)
    df = spark.range(100).selectExpr("id", "id % 3 AS part")
    # coarse key: fine
    assert sinks.partition_predicate(df, ["part"]) is not None
    # row-grain key: refused
    with pytest.raises(ValueError, match="row-grain"):
        sinks.partition_predicate(df, ["id"])


def test_null_partition_values_survive_scoped_merge(spark, tmp_path):
    """Regression: partition_predicate must match the NULL partition
    null-safely — with plain ==, the target's NULL-partition rows were
    excluded from the merge scope and the dynamic overwrite deleted them."""
    from inspig_etl_spark.sources.sinks import merge_upsert_scoped, overwrite_partitions

    path = str(tmp_path / "sink")
    schema = "day STRING, k INT, v DOUBLE"
    target = spark.createDataFrame([(None, 1, 1.0), (None, 2, 2.0), ("d1", 3, 3.0)], schema)
    overwrite_partitions(target, path, ["day"])
    updates = spark.createDataFrame([(None, 1, 10.0)], schema)
    merged = merge_upsert_scoped(
        spark.read.schema(schema).parquet(path), updates, ["day", "k"], ["day"]
    )
    overwrite_partitions(merged, path, ["day"])
    got = {(r.day, r.k): r.v for r in spark.read.schema(schema).parquet(path).collect()}
    assert got == {(None, 1): 10.0, (None, 2): 2.0, ("d1", 3): 3.0}


def test_compact_preserves_hive_partition_layout(spark, tmp_path):
    """Regression: compacting a partitioned sink flat orphaned every other
    partition on the next scoped batch; compact must keep (or refuse to
    destroy) the layout."""
    import os

    import pytest

    from inspig_etl_spark.sources.sinks import compact, overwrite_partitions

    path = str(tmp_path / "sink")
    schema = "day STRING, k INT, v DOUBLE"
    df = spark.createDataFrame([("d1", 1, 1.0), ("d2", 2, 2.0)], schema)
    overwrite_partitions(df, path, ["day"])

    with pytest.raises(ValueError, match="hive-partitioned"):
        compact(spark, path, 1)

    compact(spark, path, 1, partition_by=["day"], schema=schema)
    assert sorted(d for d in os.listdir(path) if d.startswith("day=")) == ["day=d1", "day=d2"]
    got = {(r.day, r.k): r.v for r in spark.read.schema(schema).parquet(path).collect()}
    assert got == {("d1", 1): 1.0, ("d2", 2): 2.0}

    # A scoped batch after compaction must not orphan the other partition.
    from inspig_etl_spark.sources.sinks import merge_upsert_scoped

    updates = spark.createDataFrame([("d2", 2, 20.0)], schema)
    merged = merge_upsert_scoped(
        spark.read.schema(schema).parquet(path), updates, ["day", "k"], ["day"]
    )
    overwrite_partitions(merged, path, ["day"])
    got = {(r.day, r.k): r.v for r in spark.read.schema(schema).parquet(path).collect()}
    assert got == {("d1", 1): 1.0, ("d2", 2): 20.0}


def test_merge_upsert_rejects_unknown_partial_columns(spark):
    import pytest

    from inspig_etl_spark.sources.sinks import merge_upsert

    t = spark.createDataFrame([(1, 1.0)], "k INT, rain_prob DOUBLE")
    with pytest.raises(ValueError, match="partial columns"):
        merge_upsert(t, t, ["k"], partial=["rain_prb"])  # typo must not degrade silently
    with pytest.raises(ValueError, match="partial columns"):
        merge_upsert(t, t, ["k"], partial=["k"])  # key column is not a value column
