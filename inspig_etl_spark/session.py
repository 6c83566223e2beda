"""SparkSession factory tuned for this engine.

The reference runs a hand-threaded single-node Python ETL (4 farm workers,
``src/weekly/orchestrator.py:544-551``); here all parallelism is Spark task
parallelism. Defaults are sized so that local[N] testing mirrors the plans a
real cluster would produce: AQE on (runtime coalesce + skew-join), modest
shuffle partitions, Arrow enabled for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Generic-operator correctness work runs at small SF; bench/production
    # should override via SPARK_GRAFT_SHUFFLE_PARTITIONS or spark-submit conf.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Timestamps in the test tables are NTZ; pin the session zone so
    # date extraction is stable regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # The events table is written as parquet TIMESTAMP(NANOS); read it as a
    # long once, globally, instead of mutating conf inside the reader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # local[N] runs driver+executors in ONE JVM whose default heap is 1g —
    # far too small for 32 concurrent task threads. Only honored when the
    # session factory actually launches the JVM (i.e. our own test/bench
    # processes); a cluster submit sets executor memory its own way.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # Whole-stage codegen emits one compiled class per pipeline; a session
    # running the full registry overflows the JVM's default 240 MB code
    # cache, after which hot loops run INTERPRETED (observed: the trig-heavy
    # nearest-station kernel 3-5x slower when executed late in a session;
    # 512m showed the same degradation again once the headline list grew to
    # 25 queries x 3 passes, so 1g + explicit flushing).
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
}


def get_spark(app_name: str = "inspig-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit with your cluster manager.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
