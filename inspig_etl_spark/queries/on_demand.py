"""Oracle-paired query over the on-demand single-farm report path
(pipelines/on_demand.run_single_farm — the reference's FastAPI run-farm
endpoint, ``src/api/server.py:140-206`` delegating to
``src/weekly/orchestrator.py:1244-1420``).

This is the E2E gate the batch queries can't give: the full 10-section
report built THROUGH the endpoint contract — ins_date → last-week Mon..Sun
period, default master_seq = year*100 + week_no, deterministic SHA-256
share token, single-farm predicate pushed into every scan. The oracle
recomputes the period, master_seq, and token INDEPENDENTLY in SQL
(isodow/isoyear/weekofyear/sha256), so a drifting Python date or token
implementation hash-mismatches instead of slipping through as a matching
literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.pipelines.on_demand import last_week_period, run_single_farm
from inspig_etl_spark.queries import register
from inspig_etl_spark.queries.weekly_report import sections_oracle_sql

INS_DATE = "20240131"  # Wednesday → last full week is Mon 01-22 .. Sun 01-28
FARM_NO = 3

_P = last_week_period(INS_DATE)
_PF = f"{_P['dt_from'][:4]}-{_P['dt_from'][4:6]}-{_P['dt_from'][6:]}"
_PT = f"{_P['dt_to'][:4]}-{_P['dt_to'][4:6]}-{_P['dt_to'][6:]}"

# Result contract schema — the unknown-farm (404) path returns an EMPTY frame
# of this exact shape, mirroring the oracle's zero rows for a missing farm.
_SCHEMA = (
    "farm_no bigint, gubun string, sub_gubun string, sort_no int, "
    "code_1 string, str_1 string, str_2 string, str_3 string, "
    "cnt_1 bigint, cnt_2 bigint, cnt_3 bigint, cnt_4 bigint, cnt_5 bigint, "
    "cnt_6 bigint, cnt_7 bigint, cnt_8 bigint, val_1 double, "
    "master_seq bigint, share_token string, dt_from string, dt_to string"
)


@register(
    "on_demand_farm_report",
    operators=(
        "pipeline,S3,X6 (on-demand single-farm run-farm endpoint: period "
        "contract + master-seq default + share token + farm-scoped "
        "10-section report; ref server.py:140-206, orchestrator.py:1244-1420, "
        "farm_processor.py:204-227)"
    ),
    oracle=f"""
WITH params AS (
  SELECT base,
         base - CASE WHEN isodow(base) % 7 = 0 THEN 7
                     ELSE isodow(base) % 7 END * INTERVAL 1 DAY AS last_sun
  FROM (SELECT DATE '{INS_DATE[:4]}-{INS_DATE[4:6]}-{INS_DATE[6:]}' AS base)
),
contract AS (
  SELECT CAST(isoyear(last_sun) * 100 + weekofyear(last_sun) AS BIGINT) AS master_seq,
         sha256('{FARM_NO}-' || CAST(isoyear(last_sun) AS VARCHAR) || '-'
                || CAST(weekofyear(last_sun) AS VARCHAR) || '-'
                || strftime(last_sun, '%Y%m%d')) AS share_token,
         strftime(CAST(last_sun - INTERVAL 6 DAY AS DATE), '%Y%m%d') AS dt_from,
         strftime(CAST(last_sun AS DATE), '%Y%m%d') AS dt_to
  FROM params
),
wide AS ({sections_oracle_sql(_PF, _PT)})
SELECT wide.*, contract.master_seq, contract.share_token,
       contract.dt_from, contract.dt_to
FROM wide CROSS JOIN contract
WHERE farm_no = {FARM_NO}
""",
)
def on_demand_farm_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the endpoint path for one farm and return its wide rows plus the
    response-contract columns (master_seq from the stamped wide rows; token
    and period attached from the endpoint result).

    The section dates baked into the oracle's CTEs come from the same
    Python period math the endpoint uses, but the contract columns are
    recomputed SQL-side — if ``last_week_period`` or ``share_token`` ever
    disagreed with the ISO-week/sha256 ground truth, the hash gate reds.

    Scale shape: identical to weekly_report_sections with the farm literal
    pushed below every section's scan (one farm's slice read, not the
    fleet); the contract CTE is a 1-row broadcast via the cross join.
    """
    # cache_results=False: this query executes the result exactly once per
    # driver/bench invocation — persisting would leave two farm slices cached
    # in the session every run (ADVICE r9).
    res = run_single_farm(
        spark, sf_dir, farm_no=FARM_NO, ins_date=INS_DATE, cache_results=False
    )
    if res["status"] == "error":
        # Unknown farm is the endpoint's 404, not an exception — and the
        # oracle agrees: zero section rows for a farm with no events.
        return spark.createDataFrame([], _SCHEMA)
    return (
        res["wide_rows"].select(
            "farm_no", "gubun", "sub_gubun", "sort_no", "code_1",
            "str_1", "str_2", "str_3",
            "cnt_1", "cnt_2", "cnt_3", "cnt_4", "cnt_5", "cnt_6", "cnt_7",
            "cnt_8", "val_1", "master_seq",
        )
        .withColumn("share_token", F.lit(res["share_token"]))
        .withColumn("dt_from", F.lit(res["dt_from"]))
        .withColumn("dt_to", F.lit(res["dt_to"]))
    )
