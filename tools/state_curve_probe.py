"""Long-replay state-size curves for the stateful streaming operators.

Measures — not asserts — the bounded-state claims that justify two
components' existence:

1. ``dedup_within_watermark`` (stream_dedup_watermark_evict): state must
   PLATEAU at O(keys in the last 2 x delay of event time) across a long
   replay, while the unbounded alternative (``dropDuplicates`` — the
   streaming form of stream_incremental_dedup's grow-forever ledger) rises
   linearly on the *same* input stream.
2. ``sessionize_stream`` (user_sessions_gap30's applyInPandasWithState
   kernel): per-user state must track ACTIVE users (watermark has not
   passed last_ts + gap), not users ever seen.

Replay layout (same shape as stream_dedup_watermark_evict, extended to N
one-day-apart batches, 6h delay): per batch b, FRESH new keys, DUP keys
repeating batch b-1 (state live -> dropped, no admission), READMIT keys
repeating batch b-3's fresh keys (state evicted -> re-admitted). Expected
plateau ~= 2 x per-batch admissions (keys admitted in b-1 and b-2 are the
live state during b — the measured semantics in the query's oracle).

Sessionize layout: cohort(b) of users is active in batches b and b+1 (one
event each, day apart), 1h watermark delay, 30-min gap — so per-batch
active users = 2 cohorts while users-ever grows by one cohort per batch.

The curves are read from ``query.recentProgress[*].stateOperators[0]
.numRowsTotal`` — the state store's own row count, no estimation.

Usage: python tools/state_curve_probe.py [n_batches]  (default 24; the
recentProgress ring buffer holds 100, so stay below that).
Prints one markdown table per operator plus a JSON line for SCALE.md.
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 24
FRESH, DUP, READMIT = 1000, 500, 500
DAY_S = 86_400
BASE_S = 1_700_000_000
COHORT = 100
GAP_WM = "1 hour"


def _write_batches(spark, staged, tmpdir: str) -> str:
    """One parquet file per batch with forced-monotone mtimes so the
    availableNow file source replays oldest-first (the same trick as
    stream_dedup_watermark_evict)."""
    src = f"{tmpdir}/src"
    os.makedirs(src)
    t0 = time.time() - 10_000
    for b in range(1, N_BATCHES + 1):
        sub = f"{tmpdir}/b{b}"
        staged.filter(f"batch = {b}").coalesce(1).write.parquet(sub)
        part = glob.glob(f"{sub}/part-*.parquet")[0]
        dst = f"{src}/batch_{b:03d}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (t0 + b * 10, t0 + b * 10))
    return src


def _drain(df, qname: str):
    """Run the availableNow replay to completion; return per-batch
    (numRowsTotal, numRowsUpdated) from the progress ring."""
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    curve = []
    for p in q.recentProgress:
        ops = p["stateOperators"]
        if ops and p["numInputRows"] > 0:
            curve.append(int(ops[0]["numRowsTotal"]))
    return curve


def dedup_curves(spark) -> dict:
    from pyspark.sql import functions as F

    from inspig_etl_spark.streaming.incremental import dedup_within_watermark

    b = F.col("batch")
    i = F.col("id")
    fresh = spark.range(FRESH).crossJoin(
        spark.range(1, N_BATCHES + 1).withColumnRenamed("id", "batch")
    ).select(F.md5(F.concat(F.lit("k"), b * FRESH + i)).alias("fp"), b)
    dup = spark.range(DUP).crossJoin(
        spark.range(2, N_BATCHES + 1).withColumnRenamed("id", "batch")
    ).select(F.md5(F.concat(F.lit("k"), (b - 1) * FRESH + i)).alias("fp"), b)
    readmit = spark.range(READMIT).crossJoin(
        spark.range(4, N_BATCHES + 1).withColumnRenamed("id", "batch")
    ).select(F.md5(F.concat(F.lit("k"), (b - 3) * FRESH + i)).alias("fp"), b)
    ts = F.timestamp_seconds(
        F.lit(BASE_S) + (b - 1) * DAY_S + F.crc32(F.col("fp")) % 3600
    )
    staged = (
        fresh.unionByName(dup).unionByName(readmit)
        .select("fp", b.cast("bigint").alias("batch"), ts.alias("ts"))
    )

    tmpdir = tempfile.mkdtemp(prefix="state_curve_dedup_")
    try:
        src = _write_batches(spark, staged, tmpdir)

        def stream():
            return (
                spark.readStream.schema("fp string, batch bigint, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

        evicted = _drain(
            dedup_within_watermark(stream(), "ts", ["fp"], "6 hours"),
            "curve_evict",
        )
        # the unbounded alternative on the SAME stream: dropDuplicates keeps
        # every key ever (no event-time column in the subset -> no eviction)
        unbounded = _drain(
            stream().withWatermark("ts", "6 hours").dropDuplicates(["fp"]),
            "curve_ledger",
        )
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return {"watermark_evicted": evicted, "unbounded_dropDuplicates": unbounded}


def sessionize_curve(spark) -> list:
    from pyspark.sql import functions as F

    from inspig_etl_spark.streaming.sessionize import sessionize_stream

    b = F.col("batch")
    u = F.col("id")
    # cohort(b) users emit one event in batch b and one in batch b+1
    own = spark.range(COHORT).crossJoin(
        spark.range(1, N_BATCHES + 1).withColumnRenamed("id", "batch")
    ).select((b * COHORT + u).alias("user_id"), b)
    back = spark.range(COHORT).crossJoin(
        spark.range(2, N_BATCHES + 1).withColumnRenamed("id", "batch")
    ).select(((b - 1) * COHORT + u).alias("user_id"), b)
    ev = own.unionByName(back).select(
        "user_id",
        b.cast("bigint").alias("batch"),
        (F.lit(BASE_S) + (b - 1) * DAY_S + F.col("user_id") % 1800).alias("ts_sec"),
    ).withColumn("event_id", F.col("user_id") * 1000 + b)

    tmpdir = tempfile.mkdtemp(prefix="state_curve_sess_")
    try:
        src = _write_batches(spark, ev, tmpdir)
        stream = (
            spark.readStream.schema(
                "user_id bigint, batch bigint, ts_sec bigint, event_id bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return _drain(sessionize_stream(stream, GAP_WM), "curve_sessionize")
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def main() -> None:
    from inspig_etl_spark.session import get_spark

    spark = get_spark("state-curve-probe")
    spark.sparkContext.setLogLevel("ERROR")

    dd = dedup_curves(spark)
    sess = sessionize_curve(spark)

    print("\n### dedup state per batch (numRowsTotal)\n")
    print("| batch | watermark-evicted | unbounded dropDuplicates |")
    print("|---|---|---|")
    for i, (a, c) in enumerate(zip(dd["watermark_evicted"],
                                   dd["unbounded_dropDuplicates"]), 1):
        print(f"| {i} | {a} | {c} |")
    print("\n### sessionize state per batch (numRowsTotal)\n")
    print("| batch | live user states |")
    print("|---|---|")
    for i, a in enumerate(sess, 1):
        print(f"| {i} | {a} |")
    print(json.dumps({"n_batches": N_BATCHES, "dedup": dd, "sessionize": sess}))
    spark.stop()


if __name__ == "__main__":
    main()
