"""Structured-Streaming tests (ST1-ST6): watermarked windows, foreachBatch
MERGE sink, layered precedence, stateful sessionization vs its batch oracle,
and the run manifest.

All streams run with trigger(availableNow) over parquet file sources — the
cron-batch execution mode the reference uses, drained to completion inside
the test.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.streaming.incremental import (
    RunManifest,
    layered_merge,
    start_upsert_stream,
    stream_parquet,
    windowed_counts,
)
from inspig_etl_spark.streaming.sessionize import sessionize_batch, sessionize_stream
from tests.conftest import SF_SMOKE

EVENT_SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP"


def _events_with_ts(spark):
    ev = table(spark, SF_SMOKE, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_seconds(F.col("ts_us") / 1_000_000).alias("ts"),
    )


def test_windowed_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    _events_with_ts(spark).write.parquet(src)

    stream = stream_parquet(spark, src, EVENT_SCHEMA)
    agg = windowed_counts(stream, "ts", window="6 hours", watermark="1 hour", keys=["event_type"])
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): r.event_cnt
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (r.win.start, r.event_type): r.cnt
        for r in _events_with_ts(spark)
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # availableNow emits only windows closed by the final watermark; every
    # emitted window must match the batch rollup exactly.
    assert len(got) > 0
    for k, v in got.items():
        assert expected[k] == v


def test_foreach_batch_upsert_incremental(spark, tmp_path):
    src = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "k BIGINT, v DOUBLE, ts TIMESTAMP"

    b1 = spark.createDataFrame(
        [(1, 1.0, "2024-01-01 00:00:00"), (2, 2.0, "2024-01-01 00:01:00")],
        "k BIGINT, v DOUBLE, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.write.mode("append").parquet(src)

    stream = stream_parquet(spark, src, schema)
    q = start_upsert_stream(stream, sink, ["k"], schema, ckpt).start()
    q.awaitTermination(120)
    state = {r.k: r.v for r in spark.read.parquet(sink).collect()}
    assert state == {1: 1.0, 2: 2.0}

    # Late/corrected batch (ST2): same key 2 with a new value + a new key.
    b2 = spark.createDataFrame(
        [(2, 20.0, "2024-01-01 01:00:00"), (3, 3.0, "2024-01-01 01:01:00")],
        "k BIGINT, v DOUBLE, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2.write.mode("append").parquet(src)

    stream = stream_parquet(spark, src, schema)
    q = start_upsert_stream(stream, sink, ["k"], schema, ckpt).start()
    q.awaitTermination(120)
    state = {r.k: r.v for r in spark.read.parquet(sink).collect()}
    assert state == {1: 1.0, 2: 20.0, 3: 3.0}


def test_partition_scoped_upsert_leaves_other_partitions_untouched(spark, tmp_path):
    """The scale path: a batch touching day d2 must not rewrite day d1 —
    its parquet files stay byte-identical (same names, same bytes)."""
    import hashlib
    import os

    src = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "day STRING, k BIGINT, v DOUBLE"

    def drain():
        stream = stream_parquet(spark, src, schema)
        q = start_upsert_stream(
            stream, sink, ["day", "k"], schema, ckpt, partition_by=["day"]
        ).start()
        q.awaitTermination(120)

    def snapshot(day):
        part_dir = os.path.join(sink, f"day={day}")
        return {
            f: hashlib.sha256(open(os.path.join(part_dir, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(part_dir))
            if f.endswith(".parquet")
        }

    b1 = spark.createDataFrame([("d1", 1, 1.0), ("d2", 2, 2.0)], schema)
    b1.write.mode("append").parquet(src)
    drain()
    assert {(r.day, r.k, r.v) for r in spark.read.parquet(sink).collect()} == {
        ("d1", 1, 1.0),
        ("d2", 2, 2.0),
    }
    d1_before = snapshot("d1")
    assert d1_before  # the partition exists and has files

    # Second batch touches ONLY d2: update k=2, insert k=3.
    b2 = spark.createDataFrame([("d2", 2, 20.0), ("d2", 3, 3.0)], schema)
    b2.write.mode("append").parquet(src)
    drain()
    assert {(r.day, r.k, r.v) for r in spark.read.parquet(sink).collect()} == {
        ("d1", 1, 1.0),
        ("d2", 2, 20.0),
        ("d2", 3, 3.0),
    }
    assert snapshot("d1") == d1_before


def test_merge_upsert_scoped_rejects_non_key_partition(spark):
    from inspig_etl_spark.sources.sinks import merge_upsert_scoped

    df = spark.createDataFrame([("d1", 1, 1.0)], "day STRING, k BIGINT, v DOUBLE")
    import pytest

    with pytest.raises(ValueError, match="partition columns"):
        merge_upsert_scoped(df, df, keys=["k"], partition_by=["day"])


def test_layered_merge_precedence(spark):
    schema = "k INT, v STRING"
    target = spark.createDataFrame([(1, "old"), (2, "old")], schema)
    short_term = spark.createDataFrame([(1, "forecast"), (3, "forecast")], schema)
    observed = spark.createDataFrame([(1, "observed")], schema)
    mid_term = spark.createDataFrame([(1, "mid"), (4, "mid")], schema)

    out = {
        r.k: r.v
        for r in layered_merge(target, short_term, observed, mid_term, ["k"]).collect()
    }
    # observed beats forecast beats old; mid-term only fills absent keys.
    assert out == {1: "observed", 2: "old", 3: "forecast", 4: "mid"}


def test_sessionize_stream_matches_batch_oracle(spark, tmp_path):
    src = str(tmp_path / "in")
    ev = _events_with_ts(spark).select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_sec")
    )
    ev.write.parquet(src)

    batch = {
        (r.user_id, r.event_id): r.session_no
        for r in sessionize_batch(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema("user_id BIGINT, event_id BIGINT, ts_sec BIGINT").parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.event_id): r.session_no
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert streamed == batch
    assert max(batch.values()) > 1  # the data actually breaks sessions


def test_run_manifest(tmp_path):
    path = str(tmp_path / "manifests" / "run_1.json")
    m = RunManifest(run_id="r1", path=path)
    assert m.status == "RUNNING"
    m.record_step("collect", "SUCCESS", rows=100, elapsed_ms=12)
    m.record_step("report", "ERROR", rows=0, elapsed_ms=5)
    m.finish("ERROR")
    with open(path) as f:
        payload = json.load(f)
    assert payload["status"] == "ERROR"
    assert [s["step"] for s in payload["steps"]] == ["collect", "report"]


class TestLayeredMergeScoped:
    """ST4 scale path: the layered merge joins only touched partitions."""

    SCHEMA = "wk_date string, nx int, temp double"

    def _sink(self, spark, tmp_path):
        path = str(tmp_path / "weather_sink")
        spark.createDataFrame(
            [("20240101", 1, 1.0), ("20240102", 1, 2.0), ("20240103", 1, 3.0)],
            self.SCHEMA,
        ).write.partitionBy("wk_date").parquet(path)
        return spark.read.schema(self.SCHEMA).parquet(path)

    def test_scan_carries_partition_predicate(self, spark, tmp_path):
        from inspig_etl_spark.streaming.incremental import layered_merge

        target = self._sink(spark, tmp_path)
        short = spark.createDataFrame([("20240102", 1, 2.5)], self.SCHEMA)
        out = layered_merge(
            target, short, None, None, keys=["wk_date", "nx"],
            partition_by=["wk_date"],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "20240102" in plan
        assert "20240101" not in plan  # untouched days never reach the join
        rows = {(r.wk_date, r.nx): r.temp for r in out.collect()}
        assert rows == {("20240102", 1): 2.5}  # touched partition only

    def test_layer_precedence_within_scope(self, spark, tmp_path):
        from inspig_etl_spark.streaming.incremental import layered_merge

        target = self._sink(spark, tmp_path)
        short = spark.createDataFrame(
            [("20240102", 1, 2.5), ("20240102", 2, 9.0)], self.SCHEMA
        )
        observed = spark.createDataFrame([("20240102", 1, 2.7)], self.SCHEMA)
        mid = spark.createDataFrame(
            [("20240102", 1, 0.0), ("20240102", 3, 5.0)], self.SCHEMA
        )
        out = layered_merge(
            target, short, observed, mid, keys=["wk_date", "nx"],
            partition_by=["wk_date"],
        )
        rows = {(r.wk_date, r.nx): r.temp for r in out.collect()}
        # observed beats short-term; mid-term fills only the absent key.
        assert rows == {
            ("20240102", 1): 2.7,
            ("20240102", 2): 9.0,
            ("20240102", 3): 5.0,
        }

    def test_empty_layers_touch_nothing(self, spark, tmp_path):
        from inspig_etl_spark.streaming.incremental import layered_merge

        target = self._sink(spark, tmp_path)
        empty = target.filter("1 = 0")
        out = layered_merge(
            target, empty, None, None, keys=["wk_date", "nx"],
            partition_by=["wk_date"],
        )
        assert out.count() == 0

    def test_partition_outside_keys_rejected(self, spark, tmp_path):
        import pytest
        from inspig_etl_spark.streaming.incremental import layered_merge

        target = self._sink(spark, tmp_path)
        with pytest.raises(ValueError, match="must be part of the merge keys"):
            layered_merge(
                target, target, None, None, keys=["nx"], partition_by=["wk_date"]
            )


def test_versioned_batch_dedup_keeps_greatest_version(spark, tmp_path):
    """Regression: one micro-batch can hold several versions of a key (an
    availableNow trigger drains many files at once); dedup must keep
    max(version) per key, not an arbitrary dropDuplicates winner."""
    from inspig_etl_spark.streaming.incremental import foreach_batch_upsert

    sink = str(tmp_path / "sink")
    schema = "k INT, v STRING, ver INT"
    apply = foreach_batch_upsert(sink, ["k"], schema, version_col="ver")
    batch = spark.createDataFrame(
        [(1, "old", 1), (1, "mid", 2), (1, "new", 3), (2, "only", 7)], schema
    ).repartition(8)  # scatter versions across partitions so arbitrary-winner dedup would flake
    apply(batch, 0)
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(sink).collect()}
    assert got == {1: ("new", 3), 2: ("only", 7)}
    # A later batch with an OLDER version must not regress the sink.
    apply(spark.createDataFrame([(1, "stale", 2)], schema), 1)
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(sink).collect()}
    assert got == {1: ("new", 3), 2: ("only", 7)}


def test_run_manifest_accepts_bare_relative_filename(tmp_path, monkeypatch):
    """Regression: os.makedirs('') raised FileNotFoundError for a manifest
    path with no directory component, masking the real pipeline error."""
    from inspig_etl_spark.streaming.incremental import RunManifest

    monkeypatch.chdir(tmp_path)
    m = RunManifest(run_id="r1", path="manifest.json")
    m.finish()
    import json

    assert json.load(open(tmp_path / "manifest.json"))["status"] == "COMPLETE"


def test_sessionize_state_frontier_never_regresses():
    """Regression: a late-but-above-watermark event moved last_ts BACKWARDS,
    so the next in-order event spuriously started a new session. The
    frontier must fold late events forward (documented approximation)."""
    import pandas as pd

    from inspig_etl_spark.streaming.sessionize import _OUT_COLS, _sessionize_group

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutTimestamp(self, ms):
            pass

        def getCurrentWatermarkMs(self):
            return 0

    state = FakeState()

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_sec"])
        out = list(_sessionize_group((1,), iter([pdf]), state))
        return [tuple(r) for r in out[0][_OUT_COLS].itertuples(index=False)]

    assert feed([(1, 1, 7200)]) == [(1, 1, 7200, 1)]
    # late event (above watermark): joins the current session...
    assert feed([(1, 2, 4000)]) == [(1, 2, 4000, 1)]
    # ...and must NOT have dragged the frontier back: 7300 continues session 1
    # (with the old regression, 7300-4000 > 1800 spuriously opened session 2).
    assert feed([(1, 3, 7300)]) == [(1, 3, 7300, 1)]


def test_watermark_evict_witnesses(spark):
    """The planted witnesses pin both sides of the eviction contract in the
    emitted rows themselves: '##wm-witness##i' keys (batches 1 and 4) are
    admitted TWICE — their batch-1 state was evicted before batch 4 — while
    '##wm-witness##alivei' keys (batches 1 and 3) are admitted ONCE, their
    state still live during batch 3. Every natural fingerprint obeys the
    measured rule: admitted in b iff absent from admissions in b-1, b-2."""
    from inspig_etl_spark.queries.st_manifest import (
        EVICT_WITNESS_KEY,
        EVICT_WITNESS_N,
        stream_dedup_watermark_evict,
    )
    from tests.conftest import SF_CORRECT

    rows = stream_dedup_watermark_evict(spark, SF_CORRECT).collect()
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    by_fp: dict[str, list[int]] = {}
    for r in rows:
        by_fp.setdefault(r.fp, []).append(r.batch)
    for i in range(EVICT_WITNESS_N):
        assert sorted(by_fp[h(f"{EVICT_WITNESS_KEY}{i}")]) == [1, 4]
        assert by_fp[h(f"{EVICT_WITNESS_KEY}alive{i}")] == [1]
    # the general rule over every admitted key
    admitted_by_batch: dict[int, set[str]] = {1: set(), 2: set(), 3: set(), 4: set()}
    for r in rows:
        admitted_by_batch[r.batch].add(r.fp)
    for b in (2, 3, 4):
        live = admitted_by_batch.get(b - 1, set()) | admitted_by_batch.get(b - 2, set())
        assert not (admitted_by_batch[b] & live)


def test_dedup_within_watermark_state_plateaus(spark, tmp_path):
    """The bounded-state contract as a regression gate (the full 24-batch
    curve lives in SCALE.md via tools/state_curve_probe.py): an 8-batch
    one-day-apart replay — per batch 50 FRESH keys, 20 DUPs of batch b-1
    (dropped, must NOT extend state), 20 READMITs of batch b-3 (evicted,
    re-admitted) — must show stateOperators numRowsTotal PLATEAU at
    exactly 2 x the per-batch admissions (keys admitted in b-1 and b-2 are
    the live state during b), not grow with keys-ever."""
    import glob
    import os
    import time

    from inspig_etl_spark.streaming.incremental import dedup_within_watermark

    fresh, dup, readmit, nb = 50, 20, 20, 8
    day, base = 86_400, 1_700_000_000
    b, i = F.col("batch"), F.col("id")
    mk = lambda n, lo: (
        spark.range(n)
        .crossJoin(spark.range(lo, nb + 1).withColumnRenamed("id", "batch"))
    )
    rows = (
        mk(fresh, 1).select(F.md5(F.concat(F.lit("k"), b * fresh + i)).alias("fp"), b)
        .unionByName(
            mk(dup, 2).select(
                F.md5(F.concat(F.lit("k"), (b - 1) * fresh + i)).alias("fp"), b
            )
        )
        .unionByName(
            mk(readmit, 4).select(
                F.md5(F.concat(F.lit("k"), (b - 3) * fresh + i)).alias("fp"), b
            )
        )
        .select(
            "fp",
            b.cast("bigint").alias("batch"),
            F.timestamp_seconds(
                F.lit(base) + (b - 1) * day + F.crc32(F.col("fp")) % 3600
            ).alias("ts"),
        )
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 10_000
    for k in range(1, nb + 1):
        sub = str(tmp_path / f"b{k}")
        rows.filter(F.col("batch") == k).coalesce(1).write.parquet(sub)
        dst = f"{src}/batch_{k}.parquet"
        os.replace(glob.glob(f"{sub}/part-*.parquet")[0], dst)
        os.utime(dst, (t0 + k * 10, t0 + k * 10))
    stream = (
        spark.readStream.schema("fp string, batch bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_within_watermark(stream, "ts", ["fp"], "6 hours")
        .writeStream.format("memory")
        .queryName("plateau_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    curve = [
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p["stateOperators"] and p["numInputRows"] > 0
    ]
    assert len(curve) == nb
    per_batch_admitted = fresh + readmit  # dups are dropped, never admitted
    # ramp: batches 1-3 pre-readmit, batch 4 readmits switch on, 5+ steady
    assert curve[:2] == [fresh, 2 * fresh]
    plateau = curve[4:]
    assert plateau == [2 * per_batch_admitted] * len(plateau), curve
    keys_ever = nb * fresh  # what the unbounded ledger would hold
    assert max(curve) < keys_ever


def test_sessionize_stream_state_plateaus(spark, tmp_path):
    """The sessionization bounded-state contract as a regression gate (the
    24-batch curve lives in SCALE.md): cohort(b) of users emits one event
    in batches b and b+1 (one day apart, 1h watermark, 30-min gap), so
    per-user state must plateau at <= 3 cohort widths (2 active cohorts
    plus one batch of event-time-timeout latency) while users-ever grows
    by a cohort per batch."""
    import glob
    import os
    import time

    from inspig_etl_spark.streaming.sessionize import sessionize_stream

    cohort, nb = 40, 8
    day, base = 86_400, 1_700_000_000
    b, u = F.col("batch"), F.col("id")
    mk = lambda lo: (
        spark.range(cohort)
        .crossJoin(spark.range(lo, nb + 1).withColumnRenamed("id", "batch"))
    )
    ev = (
        mk(1).select((b * cohort + u).alias("user_id"), b)
        .unionByName(mk(2).select(((b - 1) * cohort + u).alias("user_id"), b))
        .select(
            "user_id",
            b.cast("bigint").alias("batch"),
            (F.lit(base) + (b - 1) * day + F.col("user_id") % 1800).alias(
                "ts_sec"
            ),
        )
        .withColumn("event_id", F.col("user_id") * 1000 + b)
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = time.time() - 10_000
    for k in range(1, nb + 1):
        sub = str(tmp_path / f"b{k}")
        ev.filter(F.col("batch") == k).coalesce(1).write.parquet(sub)
        dst = f"{src}/batch_{k}.parquet"
        os.replace(glob.glob(f"{sub}/part-*.parquet")[0], dst)
        os.utime(dst, (t0 + k * 10, t0 + k * 10))
    stream = (
        spark.readStream.schema(
            "user_id bigint, batch bigint, ts_sec bigint, event_id bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, "1 hour")
        .writeStream.format("memory")
        .queryName("plateau_sessionize")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    curve = [
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in q.recentProgress
        if p["stateOperators"] and p["numInputRows"] > 0
    ]
    assert len(curve) == nb
    plateau = curve[2:]
    assert plateau == [3 * cohort] * len(plateau), curve
    assert max(curve) < nb * cohort  # users-ever keeps growing; state doesn't


def test_ingest_funnel_arrival_order_independent(spark, tmp_path):
    """VERDICT r12 item 3: the at-ingest funnel's flags are defined by
    batch NUMBERS carried in the data, so the FINAL sinks must not depend
    on arrival order or re-delivery. Drive the exact per-trigger function
    (_ingest_apply, the same code the stream's foreachBatch calls) through
    three replays — in-order, fully reversed, and a shuffled order with
    batch 2 delivered TWICE — and require identical final funnel tables,
    all equal to the registered query's own streamed output."""
    from inspig_etl_spark.queries.st_manifest import (
        _ING_FUNNEL_SCHEMA,
        _ingest_apply,
        _ingest_prep,
        ING_NB,
        stream_ingest_curation_funnel,
    )
    from inspig_etl_spark.sources.sinks import read_or_empty

    sf = SF_SMOKE
    prep = _ingest_prep(spark, sf).persist()
    streamed = {
        tuple(r)
        for r in stream_ingest_curation_funnel(spark, sf).collect()
    }
    assert len(streamed) == ING_NB

    for i, order in enumerate(
        [(1, 2, 3, 4), (4, 3, 2, 1), (3, 1, 2, 4, 2)]
    ):
        log_path = str(tmp_path / f"log{i}")
        funnel_path = str(tmp_path / f"funnel{i}")
        for b in order:
            _ingest_apply(
                prep.filter(F.col("batch") == b), log_path, funnel_path
            )
        got = {
            tuple(r)
            for r in read_or_empty(
                spark, funnel_path, _ING_FUNNEL_SCHEMA
            ).collect()
        }
        assert got == streamed, f"order {order} diverged"
    prep.unpersist()


def test_ingest_funnel_reconciles_to_batch_recomputation(spark):
    """Reconciliation invariants tying the replay to the batch semantics:
    stages partition each batch exactly (n_in re-adds); the ingested total
    is every non-NULL-text training doc; the exact stage reconciles to the
    corpus-wide distinct-fingerprint count (the ledger IS global exact
    dedup, just arriving in pieces); batch 1 can never be near-flagged
    (empty ledger)."""
    from inspig_etl_spark.catalog import spread, table
    from inspig_etl_spark.functions.text import tokens
    from inspig_etl_spark.queries.llm_dedup import EVAL_MOD
    from inspig_etl_spark.queries.st_manifest import (
        stream_ingest_curation_funnel,
    )

    sf = SF_SMOKE
    rows = stream_ingest_curation_funnel(spark, sf).collect()
    for r in rows:
        assert r.n_in == (
            r.n_exact_dup
            + r.n_neardup
            + r.n_quality_fail
            + r.n_contaminated
            + r.n_admitted
        )
    first = min(rows, key=lambda r: r.batch)
    assert first.n_neardup == 0  # nothing precedes batch 1

    docs = spread(table(spark, sf, "documents")).filter(
        F.col("text").isNotNull() & (F.col("doc_id") % EVAL_MOD != 0)
    )
    assert sum(r.n_in for r in rows) == docs.count()
    distinct_fp = (
        docs.select(
            F.md5(F.array_join(tokens(F.col("text")), " ")).alias("fp")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_in - r.n_exact_dup for r in rows) == distinct_fp


def test_ledger_compaction_preserves_live_funnel_rows(spark):
    """Replay-equivalence pin for compact_ingest_ledger (VERDICT r13 item
    5): recounting every LIVE batch's funnel row from the compacted
    ledger must equal recounting it from the full log — the frozen
    slice's non-canonical rows carry no future value. Also: compaction
    is idempotent, drops only frozen rows, and keeps the frozen fp set
    intact (the exact-dup probe's view)."""
    from inspig_etl_spark.queries.st_manifest import (
        ING_FROZEN,
        ING_NB,
        _ingest_funnel_rows,
        _ingest_ids,
        _ingest_prep,
    )
    from inspig_etl_spark.streaming.incremental import compact_ingest_ledger

    log = _ingest_prep(spark, SF_SMOKE).persist()

    # the registered query's lightweight identity frame must derive the
    # EXACT triples the funnel's full prep does — the two selects are
    # duplicated code on purpose (the light one avoids the Bloom stage's
    # declared crossJoin), so divergence must fail here
    ids = {tuple(r) for r in _ingest_ids(spark, SF_SMOKE).collect()}
    assert ids == {
        tuple(r) for r in log.select("doc_id", "batch", "fp").collect()
    }
    compacted = compact_ingest_ledger(log, ING_FROZEN).persist()

    live = list(range(ING_FROZEN + 1, ING_NB + 1))
    full_rows = {
        r.batch: tuple(r) for r in _ingest_funnel_rows(log, live).collect()
    }
    comp_rows = {
        r.batch: tuple(r)
        for r in _ingest_funnel_rows(compacted, live).collect()
    }
    assert full_rows == comp_rows and set(full_rows) == set(live)

    # live rows are untouched; frozen slice keeps exactly one row per fp
    frz = F.col("batch") <= ING_FROZEN
    assert (
        compacted.filter(~frz).count() == log.filter(~frz).count()
    )
    assert (
        compacted.filter(frz).count()
        == log.filter(frz).select("fp").distinct().count()
    )
    assert (
        compacted.filter(frz).select("fp").distinct().count()
        == log.filter(frz).select("fp").distinct().count()
    )

    # idempotent: compacting a compacted ledger changes nothing
    again = compact_ingest_ledger(compacted, ING_FROZEN)
    assert again.count() == compacted.count()
    log.unpersist()
    compacted.unpersist()


def test_ledger_compaction_keeps_empty_shingle_canonical(spark):
    """The subtle canonical-election edge: a fingerprint whose FIRST row
    has an empty shingle set contributes NOTHING to the near-dup band
    index (_ingest_funnel_rows filters prn==1 AND size(sh)>0 — election
    first, filter second). Compaction must keep that empty-sh canonical,
    not promote a later non-empty duplicate — electing the duplicate
    would add a band-index entry the full log never had and flip a live
    batch's near-dup verdict, as the bad-compaction contrast shows."""
    from inspig_etl_spark.functions.text import HASH_P, md5_long
    from inspig_etl_spark.operators.dedup import minhash_signature
    from inspig_etl_spark.queries.st_manifest import (
        _ING_LOG_SCHEMA,
        _ingest_funnel_rows,
    )
    from inspig_etl_spark.streaming.incremental import compact_ingest_ledger

    def sh_arr(names):
        return F.array(
            *[md5_long(F.lit(f"sh:{n}")) % HASH_P for n in names]
        )

    base = [f"t{i}" for i in range(20)]
    near = base[:19] + ["alt"]  # 19/20 shared, J = 19/21 > 0.5
    empty = F.array().cast("array<bigint>")

    def row(doc_id, batch, fp, sh):
        return F.struct(
            F.lit(doc_id).cast("bigint").alias("doc_id"),
            F.lit(batch).cast("bigint").alias("batch"),
            F.lit(fp).alias("fp"),
            sh.alias("sh"),
            F.when(F.size(sh) > 0, minhash_signature(sh))
            .otherwise(empty)
            .alias("sig"),
            F.lit(1).cast("bigint").alias("logit_e4"),
            F.lit(False).alias("contam"),
        )

    rows = [
        row(1, 1, "X", empty),  # canonical for fp X: EMPTY shingles
        row(2, 2, "X", sh_arr(base)),  # frozen exact dup of X, non-empty
        row(3, 3, "Y", sh_arr(near)),  # live; near-dup of doc 2's content
    ]
    log = spark.range(1).select(F.explode(F.array(*rows)).alias("s")).select(
        "s.*"
    )
    log = spark.createDataFrame(log.collect(), _ING_LOG_SCHEMA).persist()

    compacted = compact_ingest_ledger(log, 2)
    assert {r.doc_id for r in compacted.collect()} == {1, 3}

    full = _ingest_funnel_rows(log, [3]).collect()
    comp = _ingest_funnel_rows(compacted, [3]).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in comp]
    assert full[0].n_neardup == 0  # doc 2 never entered the band index

    # contrast: a WRONG compaction that elects the non-empty duplicate
    # as canonical would flip batch 3's verdict — the trap is real
    bad = log.filter(F.col("doc_id") != 1)
    flipped = _ingest_funnel_rows(bad, [3]).collect()
    assert flipped[0].n_neardup == 1
    log.unpersist()


def test_ledger_compaction_random_log_properties(spark):
    """Property pins for compact_ingest_ledger over randomized ledgers
    (dup patterns the synthetic generators above don't reach: a fp
    recurring in MANY frozen batches, frozen-only fps, live-only fps,
    fps straddling the boundary): for every frozen watermark W —
    (a) live rows survive verbatim; (b) exactly one row per frozen fp,
    and it is the lexicographically first (batch, doc_id); (c) the
    frozen fp SET (the exact-dup probe's view) is preserved;
    (d) idempotence: compacting twice equals compacting once."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from inspig_etl_spark.streaming.incremental import compact_ingest_ledger

    schema = (
        "doc_id BIGINT, batch BIGINT, fp STRING, sh ARRAY<BIGINT>, "
        "sig ARRAY<BIGINT>, logit_e4 BIGINT, contam BOOLEAN"
    )

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),  # batch
                st.integers(min_value=0, max_value=4),  # fp id
            ),
            min_size=1,
            max_size=25,
            unique=True,
        ),
        st.integers(min_value=0, max_value=6),  # frozen watermark W
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(pairs, w):
        rows = [
            (i, b, f"fp{k}", [k], [k], 1, False)
            for i, (b, k) in enumerate(sorted(pairs))
        ]
        log = spark.createDataFrame(rows, schema)
        got = compact_ingest_ledger(log, w).collect()
        live = [(r[0], r[1], r[2]) for r in rows if r[1] > w]
        frozen = [(r[0], r[1], r[2]) for r in rows if r[1] <= w]
        # (a) live rows verbatim
        assert sorted(
            (r.doc_id, r.batch, r.fp) for r in got if r.batch > w
        ) == sorted(live)
        # (b) one canonical per frozen fp — the min (batch, doc_id)
        want_canon = {}
        for doc_id, b, fp in frozen:
            cur = want_canon.get(fp)
            if cur is None or (b, doc_id) < cur:
                want_canon[fp] = (b, doc_id)
        got_frozen = sorted(
            (r.fp, r.batch, r.doc_id) for r in got if r.batch <= w
        )
        assert got_frozen == sorted(
            (fp, b, d) for fp, (b, d) in want_canon.items()
        )
        # (c) frozen fp set preserved
        assert {r.fp for r in got if r.batch <= w} == {f for _, _, f in frozen}
        # (d) idempotent
        again = compact_ingest_ledger(
            spark.createDataFrame(got, schema), w
        ).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, got))

    check()


def test_ingest_funnel_with_intertrigger_compaction_matches(spark, tmp_path):
    """The deployment shape end-to-end: the SAME per-trigger function the
    stream runs (_ingest_apply), but with the log sink COMPACTED between
    triggers (watermark = newest batch - 1: in an in-order replay every
    earlier batch is past the repair window). The final funnel must equal
    the plain uncompacted replay's — compaction running live inside the
    ingest loop changes no verdict, not just in the side-by-side recount."""
    from inspig_etl_spark.queries.st_manifest import (
        _ING_FUNNEL_SCHEMA,
        _ING_LOG_SCHEMA,
        _ingest_apply,
        _ingest_prep,
        ING_NB,
    )
    from inspig_etl_spark.sources.sinks import read_or_empty, staged_overwrite
    from inspig_etl_spark.streaming.incremental import compact_ingest_ledger

    prep = _ingest_prep(spark, SF_SMOKE).persist()

    plain_log = str(tmp_path / "plain_log")
    plain_fun = str(tmp_path / "plain_fun")
    comp_log = str(tmp_path / "comp_log")
    comp_fun = str(tmp_path / "comp_fun")

    for b in range(1, ING_NB + 1):
        batch = prep.filter(F.col("batch") == b)
        _ingest_apply(batch, plain_log, plain_fun)
        _ingest_apply(batch, comp_log, comp_fun)
        log = read_or_empty(spark, comp_log, _ING_LOG_SCHEMA)
        staged_overwrite(spark, compact_ingest_ledger(log, b - 1), comp_log)

    plain = {
        tuple(r)
        for r in read_or_empty(spark, plain_fun, _ING_FUNNEL_SCHEMA).collect()
    }
    comp = {
        tuple(r)
        for r in read_or_empty(spark, comp_fun, _ING_FUNNEL_SCHEMA).collect()
    }
    assert comp == plain and len(plain) == ING_NB

    # and the compacted log really is smaller when duplicates exist
    n_plain = read_or_empty(spark, plain_log, _ING_LOG_SCHEMA).count()
    n_comp = read_or_empty(spark, comp_log, _ING_LOG_SCHEMA).count()
    assert n_comp <= n_plain
    prep.unpersist()
