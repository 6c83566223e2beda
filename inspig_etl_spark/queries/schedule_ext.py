"""UD2 completion queries: the task-SEQ filter string protocol and the
farm-default schedule variant (SURVEY.md §2.10 UD2).

The reference's ``FN_MD_SCHEDULE_BSE_2020`` takes a ``seq_filter`` string
(``'-1'`` all / ``''`` none / ``'1,2,3'`` subset —
``/root/reference/src/weekly/processors/schedule.py:186-207,332-350``) and
falls back to farm-config default periods when a farm has no per-task plan
(``schedule.py:388-552``). Both are exercised here on the synthetic
last-event mapping shared with queries/status_schedule.py.

The farm-config periods are synthetic (preg_period=3, wean_period=2) so
every branch lands inside the 7-day report window of the sf test data —
the reference's real values (115/21) are per-farm TC_FARM_CONFIG rows, a
runtime parameter, not a semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.operators.schedule import (
    expand_schedule,
    farm_default_schedule,
    parse_seq_filter,
    rules_df,
    sql_rules_values,
)
from inspig_etl_spark.queries import register
from inspig_etl_spark.queries.status_schedule import (
    _SQL_LAST_EVENT,
    WINDOW_FROM,
    WINDOW_TO,
    _last_events,
)

# Task subset under test: preg checks + wean_plan + remate_check.
_SUBSET = "2,5,6"

_AVG_RETURN_DAY = 7
_PREG_PERIOD = 3
_WEAN_PERIOD = 2


@register(
    "schedule_seq_filter_modes",
    operators="UD2 (seq_filter '-1'/''/'1,2,3' task-subset protocol; ref schedule.py:186-207,332-350)",
    oracle=f"""
WITH {_SQL_LAST_EVENT},
expanded AS (
  SELECT user_id, task_seq, wk_nm,
         CAST(event_day + pass_day AS DATE) AS pass_dt
  FROM last JOIN {sql_rules_values()} USING (wk_gubun)
  WHERE event_day + pass_day BETWEEN DATE '{WINDOW_FROM}' AND DATE '{WINDOW_TO}'
)
SELECT mode, wk_nm, COUNT(*) AS task_cnt
FROM (
  SELECT 'all' AS mode, * FROM expanded
  UNION ALL
  SELECT 'subset' AS mode, * FROM expanded WHERE task_seq IN ({_SUBSET})
)
GROUP BY mode, wk_nm
""",
)
def schedule_seq_filter_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three protocol values ('-1' every task, a '1,3'-style subset list only those
    SEQs, '' none — zero rows, the reference's skip-the-count behavior)
    resolved through :func:`parse_seq_filter` and evaluated in ONE pass:
    each mode's rule subset is tagged and unioned on the RULES side (a few
    dozen broadcast rows), so the events scan + last-event window shuffle —
    the dominant cost — happens once, not once per mode. The r5-era shape
    ran :func:`expand_schedule` per mode, re-scanning events 3x; at 100 TB
    that is 3 full passes over the fact table for a constant-size protocol
    fan-out that belongs on the dimension side."""
    last = _last_events(spark, sf_dir)
    rules = rules_df(spark)

    def tagged(tag: str, seq_filter: str) -> DataFrame:
        sel = parse_seq_filter(seq_filter)
        sub = rules if sel is None else rules.filter(F.col("task_seq").isin(sel))
        return sub.withColumn("mode", F.lit(tag))

    mode_rules = tagged("all", "-1").unionByName(tagged("subset", _SUBSET)).unionByName(
        tagged("none", "")
    )
    out = expand_schedule(last, mode_rules, "event_day", WINDOW_FROM, WINDOW_TO)
    return out.groupBy("mode", "wk_nm").agg(F.count(F.lit(1)).alias("task_cnt"))


@register(
    "schedule_farm_default",
    operators="UD2,A2 (farm-default schedule: config-period offsets per last event, mating early-to-first clamp; ref schedule.py:388-552)",
    oracle=f"""
WITH {_SQL_LAST_EVENT},
typed AS (
  SELECT user_id,
         CASE WHEN wk_gubun = 'E' AND daeri_yn = 'N' THEN 'mating'
              WHEN wk_gubun = 'F' THEN 'mating'
              WHEN wk_gubun = 'G' THEN 'farrowing'
              WHEN wk_gubun = 'B' THEN 'weaning' END AS schedule_type,
         CASE WHEN wk_gubun = 'E' AND daeri_yn = 'N' THEN {_AVG_RETURN_DAY}
              WHEN wk_gubun = 'F' THEN 1
              WHEN wk_gubun = 'G' THEN {_PREG_PERIOD}
              WHEN wk_gubun = 'B' THEN {_WEAN_PERIOD} END AS off,
         event_day
  FROM last
),
dated AS (
  SELECT user_id, schedule_type,
         CASE WHEN schedule_type = 'mating'
              THEN GREATEST(event_day + off, DATE '{WINDOW_FROM}')
              ELSE event_day + off END AS pass_dt
  FROM typed WHERE schedule_type IS NOT NULL
)
SELECT user_id, schedule_type, pass_dt
FROM dated
WHERE pass_dt BETWEEN DATE '{WINDOW_FROM}' AND DATE '{WINDOW_TO}'
""",
)
def schedule_farm_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    last = _last_events(spark, sf_dir)
    out = farm_default_schedule(
        last,
        WINDOW_FROM,
        WINDOW_TO,
        avg_return_day=_AVG_RETURN_DAY,
        preg_period=_PREG_PERIOD,
        wean_period=_WEAN_PERIOD,
    )
    return out.select("user_id", "schedule_type", "pass_dt")
