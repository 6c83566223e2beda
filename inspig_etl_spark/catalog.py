"""Named parquet sources.

Replaces the reference's Oracle access layer (``src/common/database.py:117-163``,
operator S1/S2 in SURVEY.md §2.1): every load is a declarative
``spark.read.parquet`` so Catalyst gets predicate pushdown + column pruning
for free — the reference hand-writes ``FARM_NO = :farm_no`` + 2-year windows
into every SQL string for the same effect (``src/weekly/data_loader.py:228-231``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions that are genuinely bounded (25/5 rows at every SF) and safe to
# hard-broadcast. customer/supplier/part all scale with SF — let AQE's
# threshold-guarded choice decide for those, never a forced hint.
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from a scale-factor directory.

    ``events.ts`` has been shipped as parquet TIMESTAMP(NANOS) (which Spark
    reads as nanos-long under ``nanosAsLong``) in some testdata generations
    and TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ) in others, so we dispatch on the
    dtype Spark actually produced and expose a uniform ``ts_us`` column
    (microseconds since epoch, BIGINT) — the same precision DuckDB sees, and
    timezone-proof because every derivation below is wall-clock integer
    arithmetic, never a session-tz cast.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Our session factory sets nanosAsLong up front (session.py), but the
        # external driver brings a PLAIN SparkSession, so ensure it here too
        # (only helps TIMESTAMP(NANOS) files; harmless otherwise). Guarded
        # set-if-different: idempotent, never flips a value mid-session.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(key, "false") != "true":
            spark.conf.set(key, "true")
        df = spark.read.parquet(path)
        t = df.schema["ts"].dataType
        if isinstance(t, T.LongType):
            # nanos-long → micros. `div` truncates toward zero, which is
            # EXACTLY how DuckDB converts TIMESTAMP(NANOS) parquet to its
            # micros timestamps (probed: -1500 ns → -1 µs, not floor's -2),
            # and the oracle comparison is against DuckDB — so truncation,
            # not floor, is the parity-correct choice for pre-epoch rows.
            # (The TIMESTAMP/NTZ branches never face the question: those
            # generations carry no sub-microsecond component to drop.)
            ts_us = F.expr("ts div 1000")
        elif isinstance(t, T.TimestampNTZType):
            # Wall-clock difference from the NTZ epoch: pure integer result,
            # independent of spark.sql.session.timeZone.
            ts_us = F.expr(
                "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
            )
        elif isinstance(t, T.TimestampType):
            ts_us = F.unix_micros(F.col("ts"))
        else:
            raise TypeError(f"events.ts: unexpected parquet dtype {t}")
        return df.withColumn("ts_us", ts_us)
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table; handy for registering temp views."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before CPU-heavy per-row
    work (hash pipelines, trig kernels, cross-join fan-outs).

    A parquet scan yields O(file-bytes / maxPartitionBytes) tasks — correct
    for IO, but a row that is cheap to READ can be expensive to PROCESS
    (md5-per-token shingling, |stations|-fold fan-out). Spreading costs one
    tiny shuffle of the raw rows and buys cluster-wide parallelism for the
    expensive stage; at 100 TB the scan already yields thousands of tasks
    and this becomes a cheap no-op-sized rebalance (AQE coalesces it).
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
