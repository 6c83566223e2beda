"""Oracle-checked orchestration queries: ST3 all-or-nothing commit + ST6
run-manifest bookkeeping (staged_commit_retry), and the ST1/ST2 micro-batch
upsert stream (stream_microbatch_upsert) — each exercised END-TO-END
through the physical sink (not just the logical kernels).

The scenario mirrors the reference's weather saver refusing partial batches
(``/root/reference/src/collectors/weather.py:1646-1660``) and the
master/job-log rows (``orchestrator.py:946-990``):

1. an initial per-clerk aggregate is committed via ``staged_overwrite``;
2. batch 1 is POISONED (every row raises on evaluation) — its staged write
   fails, and the atomic swap guarantees the live sink is untouched;
3. batch 2 (the corrected re-run) merges against the sink re-read AFTER the
   failure and commits;
4. a ``RunManifest`` records ERROR → COMPLETE, and its (deterministic)
   statuses ride along as output columns read back from the manifest file.

The final state is SQL-expressible: initial full-outer-merged with batch 2
only — if the failed batch had leaked into the sink, or the swap had
clobbered it, the values (or the pre-cutover-only clerks) would differ, the
manifest statuses would flip, and the hash would catch either.
"""

from __future__ import annotations

import json
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.rounding import dec_sum, sql_dec_sum
from inspig_etl_spark.functions.text import sql_tokens
from inspig_etl_spark.queries import register
from inspig_etl_spark.sources.sinks import merge_upsert, staged_overwrite
from inspig_etl_spark.streaming.incremental import RunManifest

# Mid-range of the testdata's o_orderdate span (1995..2001) so both the
# initial state and the corrected batch are non-empty — a cutover outside
# the range would leave the poisoned batch rowless and never evaluated.
_CUTOVER = "1998-01-01"


def _clerk_totals(orders: DataFrame, pred) -> DataFrame:
    # The testdata orders table carries no o_clerk; derive a bounded
    # clerk-like dimension key from the customer key (97 groups).
    return (
        orders.where(pred)
        .groupBy((F.col("o_custkey") % 97).cast("int").alias("clerk"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dec_sum(F.col("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "staged_commit_retry",
    operators="ST3,ST6 (staged atomic overwrite survives a failed batch; run manifest logs ERROR then COMPLETE; ref weather.py:1646-1660, orchestrator.py:946-990)",
    oracle=f"""
WITH pre AS (
  SELECT CAST(o_custkey % 97 AS INT) AS clerk, COUNT(*) AS order_cnt,
         {sql_dec_sum('o_totalprice', 2)} AS total
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOVER}' GROUP BY 1
),
post AS (
  SELECT CAST(o_custkey % 97 AS INT) AS clerk, COUNT(*) AS order_cnt,
         {sql_dec_sum('o_totalprice', 2)} AS total
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOVER}' GROUP BY 1
)
SELECT COALESCE(post.clerk, pre.clerk) AS clerk,
       COALESCE(post.order_cnt, pre.order_cnt) AS order_cnt,
       CASE WHEN post.clerk IS NOT NULL THEN post.total ELSE pre.total END AS total,
       'ERROR' AS batch1_status, 'COMPLETE' AS batch2_status,
       'COMPLETE' AS run_status
FROM pre FULL OUTER JOIN post ON pre.clerk = post.clerk
""",
)
def staged_commit_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    tmpdir = tempfile.mkdtemp(prefix="st_commit_retry_")
    sink = f"{tmpdir}/sink"
    manifest_path = f"{tmpdir}/manifest.json"
    man = RunManifest(run_id="staged_commit_retry", path=manifest_path)
    try:
        # Initial state: pre-cutover totals, committed atomically.
        initial = _clerk_totals(
            orders, F.col("o_orderdate") < F.lit(_CUTOVER).cast("timestamp_ntz")
        )
        staged_overwrite(spark, initial, sink)

        # Batch 1: poisoned — every row raises at evaluation, so the staged
        # write fails and the swap never happens; the live sink must survive.
        poisoned = initial.withColumn(
            "total", F.assert_true(F.lit(False), F.lit("injected batch-1 failure")).cast("double")
        )
        state = spark.read.parquet(sink)
        try:
            staged_overwrite(
                spark, merge_upsert(state, poisoned, keys=["clerk"]), sink
            )
            man.record_step("batch1", "UNEXPECTED_OK", 0, 0)
        except Exception:
            man.record_step("batch1", "ERROR", 0, 0)

        # Batch 2: the corrected re-run, merged against the sink RE-READ
        # after the failure (proving it held the initial commit).
        corrected = _clerk_totals(
            orders, F.col("o_orderdate") >= F.lit(_CUTOVER).cast("timestamp_ntz")
        )
        state = spark.read.parquet(sink)
        merged = merge_upsert(state, corrected, keys=["clerk"])
        staged_overwrite(spark, merged, sink)

        # Bounded driver-side materialization: one row per clerk (a dimension
        # -sized report, same justification as sinks.py's partition-list
        # collect) — it lets the scratch sink be deleted before returning.
        # Counting/collecting must read the POST-swap sink: the pre-swap
        # lazy plans reference files the atomic rename just moved.
        final = spark.read.parquet(sink)
        rows = final.collect()
        out = spark.createDataFrame(rows, final.schema)
        man.record_step("batch2", "COMPLETE", len(rows), 0)
        man.finish("COMPLETE")

        with open(manifest_path) as f:
            recorded = json.load(f)
        steps = {s["step"]: s["status"] for s in recorded["steps"]}
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return out.select(
        "clerk",
        "order_cnt",
        "total",
        F.lit(steps["batch1"]).alias("batch1_status"),
        F.lit(steps["batch2"]).alias("batch2_status"),
        F.lit(recorded["status"]).alias("run_status"),
    )


@register(
    "stream_microbatch_upsert",
    operators="ST1,ST2 (hourly micro-batch keyed upsert driven through a real availableNow file stream — one merge per micro-batch, later batches correct earlier keys; ref weather.py:1632-1680, README.md:140-146)",
    oracle="""
WITH slices AS (
  SELECT 1 AS batch, user_id, COUNT(*) AS evt_cnt, MAX(epoch_us(ts)) AS last_ts_us
  FROM events WHERE event_id % 3 = 0 GROUP BY user_id
  UNION ALL
  SELECT 2, user_id, COUNT(*), MAX(epoch_us(ts))
  FROM events WHERE event_id % 3 = 1 GROUP BY user_id
  UNION ALL
  SELECT 3, user_id, COUNT(*), MAX(epoch_us(ts))
  FROM events WHERE event_id % 3 = 2 GROUP BY user_id
)
SELECT user_id, evt_cnt, last_ts_us FROM (
  SELECT user_id, evt_cnt, last_ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY batch DESC) AS rn
  FROM slices
) WHERE rn = 1
""",
)
def stream_microbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 exercised through Structured Streaming itself, not just the batch
    kernel: three per-user aggregates land as parquet files in a stream
    source dir (availableNow + maxFilesPerTrigger=1 replays them as three
    micro-batches), and each micro-batch runs the foreach_batch_upsert MERGE
    into the keyed sink. Each row carries its batch number and the merge is
    the VERSIONED one (greatest batch wins per user), so the final sink
    state is independent of the order the file source happens to replay the
    batches in — nothing rests on file mtime granularity or Spark's listing
    order (ADVICE r5). The oracle computes the same max-batch-wins state
    with a window, so the whole stream → foreachBatch → staged-commit path
    is value-checked.
    """
    from inspig_etl_spark.catalog import table
    from inspig_etl_spark.streaming.incremental import start_upsert_stream

    ev = table(spark, sf_dir, "events")
    schema = "user_id BIGINT, evt_cnt BIGINT, last_ts_us BIGINT, batch BIGINT"
    tmpdir = tempfile.mkdtemp(prefix="stream_upsert_")
    src = f"{tmpdir}/src"
    sink = f"{tmpdir}/sink"
    ckpt = f"{tmpdir}/ckpt"
    try:
        for k in range(3):
            batch = (
                ev.where(F.col("event_id") % 3 == k)
                .groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("evt_cnt"),
                    F.max("ts_us").alias("last_ts_us"),
                )
                .withColumn("batch", F.lit(k + 1).cast("bigint"))
            )
            batch.coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_upsert_stream(
            stream,
            sink,
            keys=["user_id"],
            schema=schema,
            checkpoint=ckpt,
            version_col="batch",
        ).start()
        q.awaitTermination()

        # Bounded materialization (one row per user) so the scratch dirs can
        # be deleted before returning — same rationale as staged_commit_retry.
        final = spark.read.schema(schema).parquet(sink)
        rows = final.collect()
        out = spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return out.select("user_id", "evt_cnt", "last_ts_us")


@register(
    "stream_incremental_dedup",
    operators=(
        "ST1 + LLM-dedup-incremental (exact dedup AT INGEST: each doc "
        "micro-batch keeps only fingerprints absent from the running "
        "dedup ledger, first-writer-wins — the streaming form of "
        "docs_exact_dedup a continuously-fed corpus needs; driven through "
        "a real availableNow file stream + versioned foreachBatch MERGE)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS toks
  FROM documents WHERE text IS NOT NULL
),
f AS (
  SELECT doc_id,
         md5(COALESCE(array_to_string(toks, ' '), '')) AS fp,
         doc_id % 3 + 1 AS batch
  FROM t
),
r AS (
  SELECT fp, doc_id, batch,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY batch, doc_id) AS rn
  FROM f
)
SELECT fp, doc_id AS first_doc_id, CAST(batch AS BIGINT) AS first_batch
FROM r WHERE rn = 1
""",
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: documents arrive in micro-batches, and only
    docs whose normalization fingerprint has never been seen before enter
    the ledger — the at-ingest form of ``docs_exact_dedup`` that a
    continuously-fed 100 TB corpus runs instead of repeated full-corpus
    passes.

    Mechanics: three per-batch doc slices land as parquet files in a
    stream source dir (``availableNow`` + ``maxFilesPerTrigger=1`` replays
    them as three micro-batches); each micro-batch runs the VERSIONED
    foreachBatch MERGE into the fingerprint ledger keyed on ``fp``. The
    version is ``-(batch * 2^50 + doc_id)`` so "greatest version wins"
    implements FIRST-writer-wins with a lowest-doc-id tiebreak — the final
    ledger is one row per fingerprint naming the earliest (batch, doc_id)
    that carried it, independent of the order the file source happens to
    replay batches in (same replay-robustness argument as
    ``stream_microbatch_upsert``; the 2^50 stride keeps the packed version
    monotone for any |doc_id| < 2^49).

    Scale shape: per batch the ledger merge is one equi-join on ``fp`` —
    at 100 TB the ledger is a Delta/Iceberg MERGE target partitioned by a
    fingerprint prefix so a batch touches only its partitions
    (``foreach_batch_upsert``'s documented ``partition_by`` path);
    fingerprints are computed in-expression at ingest, never re-derived
    from history.
    """
    import tempfile as _tf

    from inspig_etl_spark.catalog import spread
    from inspig_etl_spark.functions.text import tokens
    from inspig_etl_spark.streaming.incremental import start_upsert_stream

    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    f = docs.select(
        F.md5(F.array_join(tokens(F.col("text")), " ")).alias("fp"),
        "doc_id",
        (F.col("doc_id") % 3 + 1).cast("bigint").alias("batch"),
    ).withColumn(
        "ver", -(F.col("batch") * F.lit(1 << 50).cast("bigint") + F.col("doc_id"))
    )
    schema = "fp STRING, doc_id BIGINT, batch BIGINT, ver BIGINT"
    tmpdir = _tf.mkdtemp(prefix="stream_dedup_")
    src = f"{tmpdir}/src"
    sink = f"{tmpdir}/sink"
    ckpt = f"{tmpdir}/ckpt"
    try:
        for k in range(3):
            f.where(F.col("batch") == k + 1).coalesce(1).write.mode(
                "append"
            ).parquet(src)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_upsert_stream(
            stream,
            sink,
            keys=["fp"],
            schema=schema,
            checkpoint=ckpt,
            version_col="ver",
        ).start()
        q.awaitTermination()

        final = spark.read.schema(schema).parquet(sink)
        rows = final.collect()  # ledger-sized (one row per distinct fp)
        out = spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return out.select(
        "fp",
        F.col("doc_id").alias("first_doc_id"),
        F.col("batch").alias("first_batch"),
    )


WIN_US = 21_600_000_000  # 6-hour tumbling window, in microseconds
WM_US = 43_200_000_000  # 12-hour watermark delay, in microseconds


@register(
    "stream_windowed_event_counts",
    operators=(
        "ST + A13 (watermarked event-time tumbling-window aggregation "
        "through a real availableNow stream: 6h windows x event_type, "
        "append-mode emission gated on window_end <= final watermark — "
        "the brief's 'watermarks + windowed aggs for late data' surface, "
        "driver-verified; streaming/incremental.windowed_counts)"
    ),
    oracle=f"""
WITH u AS (
  -- us >= 0: Spark's event-time watermark INITIALIZES AT THE EPOCH, so
  -- pre-epoch rows are late even in the first micro-batch (measured on
  -- the hostile 1969-12-31 row); NULL ts is filtered the same way
  SELECT epoch_us(ts) AS us, event_type FROM events WHERE epoch_us(ts) >= 0
),
g AS (
  SELECT us - (us % {WIN_US}) AS win_start_us,
         event_type, CAST(COUNT(*) AS BIGINT) AS event_cnt
  FROM u GROUP BY 1, 2
),
m AS (SELECT MAX(us) AS mu FROM u),
w AS (
  -- the final watermark, floored to the second like Spark's ms-based
  -- tracker (second-aligned window ends make ms-vs-us truncation moot);
  -- never below the epoch it initializes at
  SELECT GREATEST(mu - (mu % 1000000) - {WM_US}, 0) AS wm FROM m
)
SELECT win_start_us, win_start_us + {WIN_US} AS win_end_us,
       event_type, event_cnt
FROM g WHERE win_start_us + {WIN_US} <= (SELECT wm FROM w)
""",
)
def stream_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation through the STREAMING engine: the
    events table replays through an availableNow file stream into
    ``windowed_counts`` (withWatermark + F.window + append mode), and the
    emitted rows — only windows the final watermark has closed,
    ``window_end <= max(event_time) - 12h``, boundary semantics pinned by
    experiment and mirrored exactly in the oracle — are the result. Two
    measured Spark semantics live in the oracle: emission is inclusive
    (``end <= wm``), and the watermark INITIALIZES AT THE EPOCH, so
    pre-epoch rows are dropped as late even in the first micro-batch
    (found by the hostile 1969-12-31 row). Window
    bounds are reported as epoch microseconds (session-timezone-proof;
    Spark's tumbling windows are epoch-aligned, so the integer
    floored-multiple in the oracle is the same boundary).

    Replay-order independence: the stream runs WITHOUT admission limits,
    so availableNow drains the source in ONE micro-batch — no
    watermark-vs-file-order race (FileStreamSource ordering is
    environmental; the multi-batch late-DROP path is deliberately not
    driver-gated for that reason, while the versioned-merge streaming
    queries cover multi-batch replay robustness).

    Scale shape: identical to the batch rollup — partial-aggregated
    groupBy on (window, event_type) — plus watermark state bounded by
    open windows x types; the memory-sink collect is bounded by emitted
    window count. At 100 TB this runs as a real continuous stream with
    the same plan; the watermark bounds state exactly as the reference's
    7-day ASOS re-read window bounds corrections.
    """
    import os as _os

    from inspig_etl_spark.streaming.incremental import windowed_counts

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
    )
    tmpdir = tempfile.mkdtemp(prefix="stream_win_")
    src = f"{tmpdir}/src"
    qname = "win_counts_" + _os.path.basename(tmpdir).replace("stream_win_", "")
    try:
        ev.write.parquet(src)
        stream = spark.readStream.schema(
            "event_id bigint, event_type string, ts timestamp"
        ).parquet(src)
        agg = windowed_counts(
            stream, "ts", window="6 hours", watermark="12 hours",
            keys=["event_type"],
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table(qname).collect()  # bounded: emitted windows x types
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    out = spark.createDataFrame(
        got, "window_start timestamp, window_end timestamp, "
        "event_type string, event_cnt bigint"
    )
    return out.select(
        F.unix_micros("window_start").alias("win_start_us"),
        F.unix_micros("window_end").alias("win_end_us"),
        "event_type",
        "event_cnt",
    )


# --- watermark-evicted streaming dedup ---------------------------------

EVICT_DAY_S = 86_400
EVICT_BASE_S = 1_700_000_000  # 2023-11-14T22:13:20Z; all math in UTC epoch
EVICT_DELAY = "6 hours"
EVICT_WITNESS_N = 10
# A key string no tokenizer output can collide with (fingerprints are md5
# over space-joined alnum tokens; '#' never survives tokenization).
EVICT_WITNESS_KEY = "##wm-witness##"

_EVICT_WITNESS_SQL = f"""
  SELECT md5('{EVICT_WITNESS_KEY}' || CAST(i AS VARCHAR)) AS fp,
         CAST(-1000 - i AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS batch
  FROM range({EVICT_WITNESS_N}) t(i)
  UNION ALL
  SELECT md5('{EVICT_WITNESS_KEY}' || CAST(i AS VARCHAR)),
         CAST(-2000 - i AS BIGINT), CAST(4 AS BIGINT)
  FROM range({EVICT_WITNESS_N}) t(i)
  UNION ALL
  SELECT md5('{EVICT_WITNESS_KEY}alive' || CAST(i AS VARCHAR)),
         CAST(-3000 - i AS BIGINT), CAST(1 AS BIGINT)
  FROM range({EVICT_WITNESS_N}) t(i)
  UNION ALL
  SELECT md5('{EVICT_WITNESS_KEY}alive' || CAST(i AS VARCHAR)),
         CAST(-4000 - i AS BIGINT), CAST(3 AS BIGINT)
  FROM range({EVICT_WITNESS_N}) t(i)
  UNION ALL
  -- one heartbeat per batch: keeps the event-time watermark advancing
  -- even when a batch carries no corpus rows (a zero-row micro-batch
  -- leaves the watermark — and therefore eviction — frozen, which the
  -- schema-only regen gate exercises); unique fp per batch, always
  -- admitted
  SELECT md5('{EVICT_WITNESS_KEY}tick' || CAST(b AS VARCHAR)),
         CAST(-9000 - b AS BIGINT), CAST(b AS BIGINT)
  FROM range(1, 5) tk(b)
"""


@register(
    "stream_dedup_watermark_evict",
    operators=(
        "ST1 + LLM-dedup-incremental-bounded (at-ingest dedup with "
        "WATERMARK-EVICTED state: dropDuplicatesWithinWatermark through a "
        "real 4-micro-batch replay — state lives only the delay window "
        "past each key's event time, so operator memory tracks the "
        "event-time window, not the corpus; eviction + re-admission "
        "semantics measured by experiment and mirrored exactly in the "
        "oracle; streaming/incremental.dedup_within_watermark)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS toks
  FROM documents WHERE text IS NOT NULL
),
f0 AS (
  SELECT md5(COALESCE(array_to_string(toks, ' '), '')) AS fp,
         doc_id,
         ((doc_id % 4) + 4) % 4 + 1 AS batch
  FROM t
),
f AS (
  SELECT fp, doc_id, CAST(batch AS BIGINT) AS batch FROM f0
  UNION ALL
  {_EVICT_WITNESS_SQL}
),
-- within-batch winner is deterministic because each batch is pre-deduped
-- to its min doc_id per fp BEFORE entering the stateful operator
d AS (SELECT fp, batch, MIN(doc_id) AS doc_id FROM f GROUP BY fp, batch),
-- the measured dropDuplicatesWithinWatermark semantics under the
-- one-day-apart / 6h-delay layout: duplicates are checked against state
-- BEFORE end-of-batch eviction, and the watermark used in batch b derives
-- from event times through batch b-1 — so live state during batch b is
-- exactly the keys ADMITTED in batches b-1 and b-2 (dropped duplicates do
-- NOT extend a key's life)
a1 AS (SELECT fp, doc_id FROM d WHERE batch = 1),
a2 AS (SELECT fp, doc_id FROM d WHERE batch = 2
       AND fp NOT IN (SELECT fp FROM a1)),
a3 AS (SELECT fp, doc_id FROM d WHERE batch = 3
       AND fp NOT IN (SELECT fp FROM a1 UNION ALL SELECT fp FROM a2)),
a4 AS (SELECT fp, doc_id FROM d WHERE batch = 4
       AND fp NOT IN (SELECT fp FROM a2 UNION ALL SELECT fp FROM a3))
SELECT fp, doc_id, CAST(1 AS BIGINT) AS batch FROM a1
UNION ALL SELECT fp, doc_id, CAST(2 AS BIGINT) FROM a2
UNION ALL SELECT fp, doc_id, CAST(3 AS BIGINT) FROM a3
UNION ALL SELECT fp, doc_id, CAST(4 AS BIGINT) FROM a4
""",
)
def stream_dedup_watermark_evict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-ingest dedup with BOUNDED state: ``stream_incremental_dedup``
    keeps every fingerprint ever seen; this query runs the same fingerprint
    stream through ``dropDuplicatesWithinWatermark`` so a key's state is
    EVICTED once the event-time watermark passes its event time + delay —
    the production shape for a corpus whose duplicate horizon is a time
    window (re-posts cluster in days, not years).

    Layout: four one-day-apart micro-batches (batch = pmod(doc_id, 4) + 1,
    event times inside each batch's first hour), 6h delay, each batch one
    parquet file with a forced-monotone mtime so the availableNow file
    source replays them in order (FileStreamSource processes oldest-mtime
    first). Each batch is pre-deduped to min doc_id per fp — the standard
    per-micro-batch reduce in front of a stateful operator — so the
    admitted row per (fp, batch) is deterministic.

    The eviction semantics in the oracle are MEASURED, not assumed (the
    stream_windowed_event_counts discipline): (1) duplicates are checked
    against state before end-of-batch eviction and the batch-b watermark
    derives from event times through batch b-1, so a key admitted in batch
    a is live state during batches a+1 and a+2 and gone at a+3; (2) a
    dropped duplicate does NOT extend its key's state life. Hence admitted
    in batch b = present in b minus admitted in {{b-1, b-2}}. Planted
    witnesses pin both paths in the driver-hashed output: ten
    '##wm-witness##i' keys appear in batches 1 and 4 and must be admitted
    TWICE (state evicted between), ten '...alive' keys appear in batches 1
    and 3 and must be admitted once (state still live).

    Scale shape: the stateful operator's memory is O(keys in the last
    2 x delay of event time) instead of O(all keys ever) — measured over a
    24-batch long replay by ``tools/state_curve_probe.py`` (SCALE.md
    "Long-replay state curves": numRowsTotal plateaus at exactly 2 x the
    per-batch admissions while the unbounded dropDuplicates control grows
    linearly on the same stream); everything else (fp at ingest, per-batch
    partial dedup) is inherited from stream_incremental_dedup.
    """
    import glob as _glob
    import os as _os
    import time as _time

    from inspig_etl_spark.catalog import spread
    from inspig_etl_spark.functions.text import tokens
    from inspig_etl_spark.streaming.incremental import dedup_within_watermark

    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    f0 = docs.select(
        F.md5(F.array_join(tokens(F.col("text")), " ")).alias("fp"),
        "doc_id",
        (((F.col("doc_id") % 4) + 4) % 4 + 1).cast("bigint").alias("batch"),
    )
    wit = spark.range(EVICT_WITNESS_N)
    witness = (
        wit.select(
            F.md5(F.concat(F.lit(EVICT_WITNESS_KEY), F.col("id"))).alias("fp"),
            (-1000 - F.col("id")).alias("doc_id"),
            F.lit(1).cast("bigint").alias("batch"),
        )
        .unionByName(
            wit.select(
                F.md5(F.concat(F.lit(EVICT_WITNESS_KEY), F.col("id"))).alias("fp"),
                (-2000 - F.col("id")).alias("doc_id"),
                F.lit(4).cast("bigint").alias("batch"),
            )
        )
        .unionByName(
            wit.select(
                F.md5(
                    F.concat(F.lit(EVICT_WITNESS_KEY + "alive"), F.col("id"))
                ).alias("fp"),
                (-3000 - F.col("id")).alias("doc_id"),
                F.lit(1).cast("bigint").alias("batch"),
            )
        )
        .unionByName(
            wit.select(
                F.md5(
                    F.concat(F.lit(EVICT_WITNESS_KEY + "alive"), F.col("id"))
                ).alias("fp"),
                (-4000 - F.col("id")).alias("doc_id"),
                F.lit(3).cast("bigint").alias("batch"),
            )
        )
        .unionByName(
            # heartbeats — see the oracle's tick comment
            spark.range(1, 5).select(
                F.md5(
                    F.concat(F.lit(EVICT_WITNESS_KEY + "tick"), F.col("id"))
                ).alias("fp"),
                (-9000 - F.col("id")).alias("doc_id"),
                F.col("id").cast("bigint").alias("batch"),
            )
        )
    )
    f = f0.unionByName(witness)
    d = f.groupBy("fp", "batch").agg(F.min("doc_id").alias("doc_id"))
    ts = F.timestamp_seconds(
        F.lit(EVICT_BASE_S)
        + (F.col("batch") - 1) * EVICT_DAY_S
        + ((F.col("doc_id") % 3600) + 3600) % 3600
    )
    staged = d.select("fp", "doc_id", "batch", ts.alias("ts"))

    tmpdir = tempfile.mkdtemp(prefix="stream_evict_")
    src = f"{tmpdir}/src"
    _os.makedirs(src)
    qname = "wm_evict_" + _os.path.basename(tmpdir).replace("stream_evict_", "")
    try:
        t0 = _time.time() - 1000
        for b in range(1, 5):
            sub = f"{tmpdir}/b{b}"
            staged.filter(F.col("batch") == b).coalesce(1).write.parquet(sub)
            part = _glob.glob(f"{sub}/part-*.parquet")[0]
            dst = f"{src}/batch_{b}.parquet"
            shutil.copyfile(part, dst)
            # one file per micro-batch, replayed oldest-mtime-first
            _os.utime(dst, (t0 + b * 10, t0 + b * 10))

        stream = (
            spark.readStream.schema(
                "fp string, doc_id bigint, batch bigint, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            dedup_within_watermark(stream, "ts", ["fp"], EVICT_DELAY)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table(qname).collect()  # bounded: one row per admission
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    out = spark.createDataFrame(
        got, "fp string, doc_id bigint, batch bigint, ts timestamp"
    )
    return out.select("fp", "doc_id", "batch")


# --- at-ingest incremental curation funnel -----------------------------------

ING_NB = 4  # micro-batches in the replay (batch = pmod(doc_id, 4) + 1)


def _ingest_oracle() -> str:
    """Order-defined batch-sequential funnel semantics in one SQL pass:
    exact first-writer-wins by (batch, doc_id), near-dup vs earlier-batch
    canonicals through the banded MinHash stack, the linear quality gate,
    then the Bloom decontamination probe — each doc counted in its FIRST
    failing stage, grouped per batch."""
    from inspig_etl_spark.functions.text import (
        sql_md5_long,
        sql_token_hashes,
        sql_token_ngram_hashes_from,
        sql_tokens,
    )
    from inspig_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_ROWS,
        SHINGLE_N,
        SQL_JACCARD,
        sql_minhash_sig,
    )
    from inspig_etl_spark.queries.llm_dedup import (
        _SQL_BLOOM_BUILD,
        _sql_bloom_member,
        CONTAM_MIN_SHARED,
        EVAL_MOD,
    )
    from inspig_etl_spark.queries.llm_text import (
        _SQL_CLS_FEATURES,
        _SQL_CLS_LOGIT,
    )

    return f"""
WITH tt AS (
  SELECT doc_id, source, text, {sql_tokens('text')} AS toks FROM documents
),
t AS (
  SELECT * FROM tt WHERE text IS NOT NULL AND doc_id % {EVAL_MOD} <> 0
),
hsh AS (SELECT doc_id, {sql_token_hashes('toks')} AS hs FROM tt),
shd AS (
  SELECT doc_id, {sql_token_ngram_hashes_from('hs', SHINGLE_N)} AS sh FROM hsh
),
ev AS (SELECT DISTINCT unnest(sh) AS s FROM shd WHERE doc_id % {EVAL_MOD} = 0),
{_SQL_BLOOM_BUILD},
f AS (
{_SQL_CLS_FEATURES}
),
ing AS (
  SELECT t.doc_id,
         CAST(((t.doc_id % {ING_NB}) + {ING_NB}) % {ING_NB} + 1 AS BIGINT)
           AS batch,
         md5(COALESCE(array_to_string(t.toks, ' '), '')) AS fp,
         shd.sh AS sh,
         CAST({_SQL_CLS_LOGIT} AS BIGINT) AS logit_e4,
         COALESCE(len(list_filter(shd.sh, s -> {_sql_bloom_member('s')})), 0)
           >= {CONTAM_MIN_SHARED} AS contam
  FROM t JOIN shd ON shd.doc_id = t.doc_id
       JOIN f ON f.doc_id = t.doc_id
       CROSS JOIN wl
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY batch, doc_id) AS rn
  FROM ing
),
sig AS (
  SELECT doc_id, batch, {sql_minhash_sig()} AS sig
  FROM (SELECT doc_id, batch, sh FROM r WHERE rn = 1 AND len(sh) > 0)
),
band AS (
  SELECT doc_id, batch, band_no,
         CAST(('0x' || substr(md5(array_to_string(sig[band_no * {MINHASH_ROWS} + 1 : band_no * {MINHASH_ROWS} + {MINHASH_ROWS}], '_')), 1, 15)) AS BIGINT) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band_no)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r2.doc_id AS id_b
  FROM band l JOIN band r2
    ON l.band_no = r2.band_no AND l.band_key = r2.band_key
   AND r2.batch < l.batch
),
near AS (
  SELECT DISTINCT cand.id_a AS doc_id
  FROM cand JOIN shd a ON cand.id_a = a.doc_id
            JOIN shd b ON cand.id_b = b.doc_id
  WHERE {SQL_JACCARD} >= {JACCARD_THRESHOLD}
),
fl AS (
  SELECT r.batch, r.rn, r.logit_e4, r.contam,
         near.doc_id IS NOT NULL AS nd
  FROM r LEFT JOIN near ON near.doc_id = r.doc_id
)
SELECT batch,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(COUNT(CASE WHEN rn > 1 THEN 1 END) AS BIGINT) AS n_exact_dup,
       CAST(COUNT(CASE WHEN rn = 1 AND nd THEN 1 END) AS BIGINT) AS n_neardup,
       CAST(COUNT(CASE WHEN rn = 1 AND NOT nd AND logit_e4 < 0 THEN 1 END)
            AS BIGINT) AS n_quality_fail,
       CAST(COUNT(CASE WHEN rn = 1 AND NOT nd AND logit_e4 >= 0 AND contam
                  THEN 1 END) AS BIGINT) AS n_contaminated,
       CAST(COUNT(CASE WHEN rn = 1 AND NOT nd AND logit_e4 >= 0 AND NOT contam
                  THEN 1 END) AS BIGINT) AS n_admitted
FROM fl GROUP BY batch
"""


_ING_LOG_SCHEMA = (
    "doc_id BIGINT, batch BIGINT, fp STRING, sh ARRAY<BIGINT>, "
    "sig ARRAY<BIGINT>, logit_e4 BIGINT, contam BOOLEAN"
)
_ING_FUNNEL_SCHEMA = (
    "batch BIGINT, n_in BIGINT, n_exact_dup BIGINT, n_neardup BIGINT, "
    "n_quality_fail BIGINT, n_contaminated BIGINT, n_admitted BIGINT"
)


def _ingest_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row ingest artifacts, computed IN-EXPRESSION at ingest time (the
    production contract: fingerprints/sketches/scores are derived once as
    rows arrive, never re-derived from history): normalization fingerprint,
    shingle set, MinHash signature, classifier logit, and the Bloom
    decontamination flag (ONE constant broadcast bitmap probe)."""
    from inspig_etl_spark.catalog import spread
    from inspig_etl_spark.functions.text import (
        token_hashes,
        token_ngram_hashes_from,
        tokens,
    )
    from inspig_etl_spark.operators.dedup import SHINGLE_N, minhash_signature
    from inspig_etl_spark.queries.llm_dedup import (
        EVAL_MOD,
        docs_decontaminate_bloom,
    )
    from inspig_etl_spark.queries.llm_text import _cls_logit_frame

    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull() & (F.col("doc_id") % EVAL_MOD != 0)
    )
    base = docs.select(
        "doc_id",
        (F.pmod(F.col("doc_id"), ING_NB) + 1).cast("bigint").alias("batch"),
        F.md5(F.array_join(tokens(F.col("text")), " ")).alias("fp"),
        token_hashes(tokens(F.col("text"))).alias("hs"),
    ).select(
        "doc_id",
        "batch",
        "fp",
        token_ngram_hashes_from(F.col("hs"), SHINGLE_N).alias("sh"),
    )
    base = base.withColumn(
        "sig",
        F.when(F.size("sh") > 0, minhash_signature(F.col("sh"))).otherwise(
            F.array().cast("array<bigint>")
        ),
    )
    logit = _cls_logit_frame(spark, sf_dir).select("doc_id", "logit_e4")
    contam = docs_decontaminate_bloom(spark, sf_dir).select(
        "doc_id", F.col("is_flagged").alias("contam")
    )
    return base.join(logit, "doc_id").join(contam, "doc_id").select(
        "doc_id", "batch", "fp", "sh", "sig", "logit_e4", "contam"
    )


def _ingest_funnel_rows(log: DataFrame, batches) -> DataFrame:
    """Recompute the funnel row for each batch in ``batches`` from the
    ingest log — flags are defined by BATCH NUMBERS carried in the data
    (batch-vs-earlier-batch), never by arrival time, which is what makes
    the final funnel arrival-order independent."""
    from inspig_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_ROWS,
        jaccard_verify,
        lsh_band_keys,
    )
    from pyspark.sql import Window

    out = None
    shingles = log.select("doc_id", "sh")
    for b in sorted(batches):
        cur = log.filter(F.col("batch") == b)
        prior = log.filter(F.col("batch") < b)
        w = Window.partitionBy("fp").orderBy("doc_id")
        cur = cur.withColumn("rn", F.row_number().over(w))
        seen = prior.select("fp").distinct().withColumn(
            "dup_prior", F.lit(True)
        )
        cur = cur.join(seen, "fp", "left").withColumn(
            "exact_dup",
            (F.col("rn") > 1) | F.coalesce(F.col("dup_prior"), F.lit(False)),
        )
        # near-dup ledger: earlier-batch CANONICALS (first (batch, doc_id)
        # per fp within the prior log), banded; probe with this batch's
        # canonical, non-empty-shingle docs only (the house banding rule)
        wp = Window.partitionBy("fp").orderBy("batch", "doc_id")
        prior_canon = (
            prior.withColumn("prn", F.row_number().over(wp))
            .filter((F.col("prn") == 1) & (F.size("sh") > 0))
            .select("doc_id", "sig")
        )
        cur_canon = cur.filter(~F.col("exact_dup") & (F.size("sh") > 0)).select(
            "doc_id", "sig"
        )

        def _banded(df, id_alias):
            return df.select(
                F.col("doc_id").alias(id_alias),
                F.posexplode(
                    lsh_band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_ROWS)
                ).alias("band_no", "band_key"),
            )

        cand = (
            _banded(cur_canon, "id_a")
            .join(_banded(prior_canon, "id_b"), ["band_no", "band_key"])
            .select("id_a", "id_b")
            .distinct()
        )
        near = (
            jaccard_verify(cand, shingles, "doc_id", "sh", JACCARD_THRESHOLD)
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("nd0", F.lit(True))
        )
        fl = cur.join(near, "doc_id", "left").select(
            "batch",
            "exact_dup",
            F.coalesce(F.col("nd0"), F.lit(False)).alias("nd"),
            "logit_e4",
            "contam",
        )
        ok = ~F.col("exact_dup") & ~F.col("nd")
        row = fl.groupBy("batch").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_in"),
            F.count(F.when(F.col("exact_dup"), 1)).cast("bigint").alias("n_exact_dup"),
            F.count(F.when(~F.col("exact_dup") & F.col("nd"), 1))
            .cast("bigint")
            .alias("n_neardup"),
            F.count(F.when(ok & (F.col("logit_e4") < 0), 1))
            .cast("bigint")
            .alias("n_quality_fail"),
            F.count(F.when(ok & (F.col("logit_e4") >= 0) & F.col("contam"), 1))
            .cast("bigint")
            .alias("n_contaminated"),
            F.count(F.when(ok & (F.col("logit_e4") >= 0) & ~F.col("contam"), 1))
            .cast("bigint")
            .alias("n_admitted"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _ingest_apply(batch_df: DataFrame, log_path: str, funnel_path: str) -> None:
    """One ingest trigger: merge the arriving rows into the log
    (insert_if_absent on doc_id — re-delivery is a no-op) and (re)derive
    the funnel rows for the arriving batch plus any logged LATER batch
    (the out-of-order repair), merge-upserting them by batch key.
    Module-level so the permuted-replay tests can drive the exact
    production path without a stream."""
    from inspig_etl_spark.sources.sinks import (
        insert_if_absent,
        merge_upsert,
        read_or_empty,
        staged_overwrite,
    )

    sp = batch_df.sparkSession
    arriving = [
        r.batch for r in batch_df.select("batch").distinct().collect()
    ]  # bounded by the replay depth (files per trigger)
    if not arriving:
        return
    log = read_or_empty(sp, log_path, _ING_LOG_SCHEMA)
    merged = insert_if_absent(log, batch_df, ["doc_id"])
    staged_overwrite(sp, merged, log_path)
    log = read_or_empty(sp, log_path, _ING_LOG_SCHEMA)
    logged = [r.batch for r in log.select("batch").distinct().collect()]
    affected = sorted(set(arriving) | {b for b in logged if b > min(arriving)})
    rows = _ingest_funnel_rows(log, affected)
    funnel = read_or_empty(sp, funnel_path, _ING_FUNNEL_SCHEMA)
    staged_overwrite(sp, merge_upsert(funnel, rows, ["batch"]), funnel_path)


@register(
    "stream_ingest_curation_funnel",
    operators=(
        "ST1 + LLM-curation-at-ingest (the production ingest shape, "
        "composed from the four existing stages: each availableNow "
        "micro-batch flows exact-fp ledger dedup -> batch-vs-ledger "
        "banded MinHash near-dup -> linear quality gate -> Bloom "
        "decontamination probe, emitting per-batch funnel-stage counts "
        "and updating the ingest ledger; flags are defined by batch "
        "NUMBERS carried in the data, so the final funnel is "
        "arrival-order independent and replay-idempotent)"
    ),
    oracle=_ingest_oracle(),
)
def stream_ingest_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-ingest incremental curation (VERDICT r12 item 3): the batch
    curation funnel's stages replayed as a REAL availableNow micro-batch
    stream with per-batch accounting — what a continuously-fed 100 TB
    corpus runs instead of repeated full-corpus passes. Four batches
    (pmod(doc_id, 4) + 1), one parquet file each, forced-monotone mtimes
    so the file source replays them in order (the production queue
    contract; reference analog: the idempotent hourly upsert with
    late-data lookback, /root/reference/src/collectors/weather.py:
    1632-1680,1480-1551).

    Each trigger: (1) the arriving rows — fingerprint, shingles, MinHash
    signature, classifier logit, Bloom flag, all computed in-expression
    at ingest — merge into the ingest log via insert_if_absent on doc_id
    (re-delivery is a no-op); (2) the funnel rows for the arriving batch
    AND any logged LATER batch are (re)derived from the log and
    merge-upserted into the funnel sink keyed on batch. Because every
    stage flag compares a batch only against SMALLER batch numbers in the
    data, out-of-order arrival self-repairs: delivering batch 4 first
    just means its row is recomputed when 1..3 land, and the FINAL funnel
    equals the one-pass oracle regardless of arrival order (pinned by the
    reversed-replay test).

    Stage semantics (each doc counted in its FIRST failing stage):
    exact_dup = a same-fingerprint row exists with smaller (batch,
    doc_id); neardup = banded-MinHash + exact-Jaccard match against an
    EARLIER batch's exact-canonical (the ledger tracks content SEEN, not
    content kept — a paraphrase of already-rejected content is still a
    duplicate); quality_fail = classifier logit < 0; contaminated = the
    Bloom probe (eval-shingle bitmap) fires.

    Scale shape: per trigger the exact-ledger check is one equi-join on
    fp and the near-dup probe is the batch-vs-ledger band equi-join
    (docs_minhash_incremental_neardup's shape — at 100 TB the band index
    and fp ledger are persisted tables partitioned by key, so the probe
    shuffles only the batch side; the local staged-parquet re-read is the
    test-container stand-in, same as every sink in this module). The
    quality and Bloom gates are per-row expressions. The funnel sink is
    O(batches); the one driver collect per trigger is the distinct batch
    list (bounded by the replay depth). Ledger growth is measured in
    SCALE.md ("Ledger growth & compaction"): the log grows with DISTINCT
    content by design — the compaction policy a deployment runs is
    documented there.
    """
    import glob as _glob
    import os as _os
    import time as _time

    from inspig_etl_spark.sources.sinks import read_or_empty

    staged = _ingest_prep(spark, sf_dir)

    tmpdir = tempfile.mkdtemp(prefix="stream_ingest_")
    src = f"{tmpdir}/src"
    _os.makedirs(src)
    log_path = f"{tmpdir}/log"
    funnel_path = f"{tmpdir}/funnel"
    ckpt = f"{tmpdir}/ckpt"

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        _ingest_apply(batch_df, log_path, funnel_path)

    try:
        t0 = _time.time() - 1000
        for b in range(1, ING_NB + 1):
            sub = f"{tmpdir}/b{b}"
            staged.filter(F.col("batch") == b).coalesce(1).write.parquet(sub)
            part = _glob.glob(f"{sub}/part-*.parquet")[0]
            dst = f"{src}/batch_{b}.parquet"
            shutil.copyfile(part, dst)
            # one file per micro-batch, replayed oldest-mtime-first
            _os.utime(dst, (t0 + b * 10, t0 + b * 10))

        stream = (
            spark.readStream.schema(_ING_LOG_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(apply)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        final = read_or_empty(spark, funnel_path, _ING_FUNNEL_SCHEMA)
        rows = final.collect()  # funnel-sized: one row per batch
        out = spark.createDataFrame(rows, final.schema)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return out


# --- ledger compaction (the SCALE.md policy, as an operator) ------------------

ING_FROZEN = 2  # batches 1..ING_FROZEN are past the out-of-order repair window


def _ingest_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest log's identity triple (doc_id, batch, fp) — the same
    derivation as ``_ingest_prep``'s first select (pinned equal by
    tests/test_streaming.py::test_ledger_compaction_preserves_live_funnel_rows)
    without the shingle/signature/logit/Bloom artifacts the compaction
    accounting never reads; building them would also drag the Bloom
    stage's declared 1-row crossJoin into an otherwise lint-clean plan."""
    from inspig_etl_spark.catalog import spread
    from inspig_etl_spark.functions.text import tokens
    from inspig_etl_spark.queries.llm_dedup import EVAL_MOD

    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull() & (F.col("doc_id") % EVAL_MOD != 0)
    )
    return docs.select(
        "doc_id",
        (F.pmod(F.col("doc_id"), ING_NB) + 1).cast("bigint").alias("batch"),
        F.md5(F.array_join(tokens(F.col("text")), " ")).alias("fp"),
    )


def _compaction_oracle() -> str:
    """The compaction contract in one SQL pass: the log's (doc_id, batch,
    fp) triples (the same fp/batch derivation as the funnel oracle's
    ``ing`` CTE), a rank-1-per-fp window over the FROZEN slice only, and
    per-batch before/after accounting."""
    from inspig_etl_spark.queries.llm_dedup import EVAL_MOD

    return f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
  WHERE text IS NOT NULL AND doc_id % {EVAL_MOD} <> 0
),
ing AS (
  SELECT doc_id,
         CAST(((doc_id % {ING_NB}) + {ING_NB}) % {ING_NB} + 1 AS BIGINT)
           AS batch,
         md5(COALESCE(array_to_string(toks, ' '), '')) AS fp
  FROM t
),
fr AS (
  SELECT batch,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY batch, doc_id) AS rn
  FROM ing WHERE batch <= {ING_FROZEN}
),
kept AS (
  SELECT batch FROM fr WHERE rn = 1
  UNION ALL
  SELECT batch FROM ing WHERE batch > {ING_FROZEN}
),
b4 AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS rows_before FROM ing GROUP BY batch
),
af AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS rows_after FROM kept GROUP BY batch
)
SELECT b4.batch,
       b4.batch <= {ING_FROZEN} AS frozen,
       b4.rows_before,
       COALESCE(af.rows_after, 0) AS rows_after,
       b4.rows_before - COALESCE(af.rows_after, 0) AS n_dropped
FROM b4 LEFT JOIN af ON b4.batch = af.batch
"""


@register(
    "stream_ingest_ledger_compaction",
    operators=(
        "ST-ext ledger compaction (VERDICT r13 item 5: the SCALE.md "
        "'Ledger growth & compaction' policy as a real operator — batches "
        "past the out-of-order repair window keep ONE canonical row per "
        "fingerprint, live batches keep every row; per-batch "
        "before/after/dropped accounting)"
    ),
    oracle=_compaction_oracle(),
)
def stream_ingest_ledger_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction of the at-ingest funnel's ledger, with accounting.

    The same deterministic log ``stream_ingest_curation_funnel`` replays
    (``_ingest_prep``: batch = pmod(doc_id, ING_NB) + 1, fp = md5 of the
    token join) is compacted at ``frozen_max_batch = ING_FROZEN``:
    batches 1..ING_FROZEN are final, so
    :func:`~inspig_etl_spark.streaming.incremental.compact_ingest_ledger`
    keeps only the rank-1-per-fingerprint canonical from that slice (the
    exact-fp probe set and the near-dup band index later batches join
    against are functions of canonicals alone — see the operator's
    docstring for why no future verdict can change, and
    tests/test_streaming.py for the replay-equivalence pin).
    The output is one row per batch: rows_before, rows_after, n_dropped,
    and the frozen flag — the accounting a deployment's compaction job
    emits to its run manifest.

    Scale shape: the compaction itself is ONE row_number window keyed on
    fp over the frozen slice (the live slice never shuffles); the
    accounting is two map-side-combinable per-batch counts joined on the
    O(batches)-row batch key. Reference analog: the delete-then-insert
    idempotent saver retiring superseded rows once a section is final,
    /root/reference/src/collectors/productivity.py:375-451.
    """
    from inspig_etl_spark.streaming.incremental import compact_ingest_ledger

    log = _ingest_ids(spark, sf_dir).persist()
    compacted = compact_ingest_ledger(log, ING_FROZEN)
    before = log.groupBy("batch").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_before")
    )
    after = compacted.groupBy("batch").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_after")
    )
    return (
        before.join(after, "batch", "left")
        .select(
            "batch",
            (F.col("batch") <= ING_FROZEN).alias("frozen"),
            "rows_before",
            F.coalesce(F.col("rows_after"), F.lit(0)).cast("bigint").alias("rows_after"),
            (
                F.col("rows_before")
                - F.coalesce(F.col("rows_after"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
