"""Batch sessionization query — the oracle-checked face of the streaming
sessionizer (streaming/sessionize.py); both share one semantic definition,
and tests/test_streaming.py proves the stateful path agrees with this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import us_to_sec
from inspig_etl_spark.queries import register
from inspig_etl_spark.streaming.sessionize import GAP_SECONDS, sessionize_batch


@register(
    "user_sessions_gap30",
    operators="W2,A2 + streaming/sessionize (gap-based sessionization, batch form of the stateful operator)",
    oracle=f"""
WITH e AS (
  -- floor via double division, not integer // (DuckDB // truncates)
  SELECT user_id, event_id, CAST(FLOOR(epoch_us(ts) / 1000000.0) AS BIGINT) AS ts_sec
  FROM events
),
g AS (
  SELECT user_id, event_id, ts_sec,
         CASE WHEN ts_sec - LAG(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) > {GAP_SECONDS}
              THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, event_id,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                             ROWS UNBOUNDED PRECEDING) + 1 AS INT) AS session_no
  FROM g
)
SELECT user_id,
       MAX(session_no) AS n_sessions,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id
""",
)
def user_sessions_gap30(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", us_to_sec(F.col("ts_us")).alias("ts_sec")
    )
    sessions = sessionize_batch(ev)
    return sessions.groupBy("user_id").agg(
        F.max("session_no").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
