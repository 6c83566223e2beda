"""Oracle-paired queries over the composed weekly-report pipeline
(pipelines/weekly.py): the wide-row section union and the per-farm summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.functions.rounding import sql_dec_sum
from inspig_etl_spark.pipelines.weekly import (
    STATUS_SPINE,
    WEEK_FROM,
    WEEK_TO,
    build_weekly_report,
)
from inspig_etl_spark.queries import register
from inspig_etl_spark.queries.status_schedule import (
    _SQL_LAST_EVENT,
)
from inspig_etl_spark.operators.status import sql_status_from_last_event

_SQL_STATUS = f"""
status AS (
  SELECT user_id % 10 AS farm_no,
         {sql_status_from_last_event('wk_gubun', 'sago_gubun_cd', 'daeri_yn', 'NULL')} AS status_cd
  FROM last
)"""

_SQL_SPINE = "spine(sort_no, status_cd) AS (VALUES " + ", ".join(
    f"({i + 1}, '{s}')" for i, s in enumerate(STATUS_SPINE)
) + ")"

_SQL_WEEK_PURCHASES = f"""
purch AS (
  SELECT user_id % 10 AS farm_no, CAST(ts AS DATE) AS d,
         COUNT(*) AS cnt, ROUND({sql_dec_sum('value', 6)}, 6) AS val
  FROM events
  WHERE event_type = 'purchase'
    AND CAST(ts AS DATE) BETWEEN DATE '{WEEK_FROM}' AND DATE '{WEEK_TO}'
  GROUP BY 1, 2
)"""


@register(
    "weekly_report_sections",
    operators="pipeline: A15+J10+UD1 composed into the wide-row section union (ref async_processor.py:103-224, TS_INS_WEEK_SUB)",
    oracle=f"""
WITH {_SQL_LAST_EVENT}, {_SQL_STATUS}, {_SQL_SPINE}, {_SQL_WEEK_PURCHASES},
counts AS (
  SELECT farm_no, status_cd, COUNT(*) AS cnt FROM status GROUP BY 1, 2
),
md_farms AS (SELECT DISTINCT farm_no FROM status),
md AS (
  SELECT md_farms.farm_no, 'MD' AS gubun, 'STAT' AS sub_gubun, spine.sort_no,
         spine.status_cd AS code_1, CAST(NULL AS VARCHAR) AS str_1,
         COALESCE(cnt, 0) AS cnt_1, CAST(NULL AS DOUBLE) AS val_1
  FROM md_farms CROSS JOIN spine
  LEFT JOIN counts ON counts.farm_no = md_farms.farm_no
                   AND counts.status_cd = spine.status_cd
),
days AS (
  SELECT CAST(d AS DATE) AS d,
         CAST(date_diff('day', DATE '{WEEK_FROM}', CAST(d AS DATE)) + 1 AS INT) AS sort_no
  FROM generate_series(DATE '{WEEK_FROM}', DATE '{WEEK_TO}', INTERVAL 1 DAY) t(d)
),
sh_farms AS (SELECT DISTINCT user_id % 10 AS farm_no FROM events),
sh AS (
  SELECT sh_farms.farm_no, 'SH' AS gubun, 'CHART' AS sub_gubun, days.sort_no,
         CAST(NULL AS VARCHAR) AS code_1, strftime(days.d, '%Y%m%d') AS str_1,
         purch.cnt AS cnt_1, purch.val AS val_1
  FROM sh_farms CROSS JOIN days
  LEFT JOIN purch ON purch.farm_no = sh_farms.farm_no AND purch.d = days.d
)
SELECT * FROM md UNION ALL SELECT * FROM sh
""",
)
def weekly_report_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide, _summary = build_weekly_report(spark, sf_dir)
    return wide.select(
        "farm_no", "gubun", "sub_gubun", "sort_no", "code_1", "str_1", "cnt_1", "val_1"
    )


@register(
    "weekly_report_summary",
    operators="pipeline,A20 (per-farm summary row assembly + count gates; ref TS_INS_WEEK, farm_processor.py:245-316)",
    oracle=f"""
WITH {_SQL_LAST_EVENT}, {_SQL_STATUS}, {_SQL_WEEK_PURCHASES},
herd AS (
  SELECT farm_no,
         COUNT(*) AS total_users,
         COUNT(CASE WHEN status_cd = '010002' THEN 1 END) AS pregnant_cnt,
         COUNT(CASE WHEN status_cd IN ('010003', '010004') THEN 1 END) AS nursing_cnt
  FROM status GROUP BY farm_no
),
week AS (
  -- aggregated from raw events, NOT from the per-day rounded vals: a sum
  -- of rounded day values would differ from the rounded farm-level sum.
  SELECT user_id % 10 AS farm_no, COUNT(*) AS week_purchase_cnt,
         ROUND({sql_dec_sum('value', 6)}, 6) AS week_purchase_value
  FROM events
  WHERE event_type = 'purchase'
    AND CAST(ts AS DATE) BETWEEN DATE '{WEEK_FROM}' AND DATE '{WEEK_TO}'
  GROUP BY 1
)
SELECT herd.farm_no, total_users, pregnant_cnt, nursing_cnt,
       COALESCE(week_purchase_cnt, 0) AS week_purchase_cnt,
       -- reference convention: shipment sums are NVL(SUM(...), 0)
       -- (shipment.py:397), so cnt and value agree for a no-purchase week
       COALESCE(week_purchase_value, CAST(0 AS DOUBLE)) AS week_purchase_value
FROM herd LEFT JOIN week ON herd.farm_no = week.farm_no
""",
)
def weekly_report_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _wide, summary = build_weekly_report(spark, sf_dir)
    return summary
