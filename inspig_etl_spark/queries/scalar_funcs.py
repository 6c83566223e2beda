"""Scalar-function + sentinel-date queries (SURVEY.md §2.2 F4/F5/F7, §2.8
X1/X2/X4/X5/X6/X12/X17/X18).

The reference's most pervasive idiom: business dates as 'yyyyMMdd' strings
compared lexicographically with the '99991231' alive sentinel. These queries
derive that shape from the synthetic tables and run every helper through the
oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import (
    ALIVE_SENTINEL,
    add_days_str,
    date_diff_tolerant,
    from_yyyymmdd,
    is_alive,
    is_culled,
    to_yyyymmdd,
)
from inspig_etl_spark.queries import register

BASE_DATE = "19980101"  # yyyymmdd business base date


@register(
    "sentinel_alive_culled",
    operators="F4,F5,X5,J1 (alive/culled sentinel predicates on yyyymmdd strings; ref data_loader.py:834-863)",
    oracle=f"""
WITH per_cust AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) > 0
              THEN '{ALIVE_SENTINEL}'
              ELSE strftime(MAX(o_orderdate), '%Y%m%d') END AS out_dt
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_mktsegment
)
SELECT c_mktsegment,
       COUNT(CASE WHEN out_dt = '{ALIVE_SENTINEL}' OR out_dt > '{BASE_DATE}' THEN 1 END) AS alive_cnt,
       COUNT(CASE WHEN out_dt <> '{ALIVE_SENTINEL}' AND out_dt <= '{BASE_DATE}' THEN 1 END) AS culled_cnt,
       MIN(CASE WHEN out_dt <> '{ALIVE_SENTINEL}' THEN out_dt END) AS first_out_dt
FROM per_cust
GROUP BY c_mktsegment
""",
)
def sentinel_alive_culled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers modeled as entities: any open order → alive sentinel,
    else last order date as the yyyymmdd out-date. Counts per segment via
    pure lexicographic string compares (never a date cast in the filter)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus", "o_orderdate")
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.when(
                F.count(F.when(F.col("o_orderstatus") == "O", 1)) > 0, ALIVE_SENTINEL
            )
            .otherwise(to_yyyymmdd(F.max("o_orderdate")))
            .alias("out_dt")
        )
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.count(F.when(is_alive(F.col("out_dt"), BASE_DATE), 1)).alias("alive_cnt"),
        F.count(F.when(is_culled(F.col("out_dt"), BASE_DATE), 1)).alias("culled_cnt"),
        F.min(
            F.when(F.col("out_dt") != ALIVE_SENTINEL, F.col("out_dt"))
        ).alias("first_out_dt"),
    )


@register(
    "string_date_roundtrip",
    operators="X1,X2,X5,X6 (tolerant diff, add_days, reformat, month arithmetic; ref base.py:376-419)",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         strftime(o_orderdate, '%Y%m%d') AS ymd,
         CASE WHEN o_orderkey % 2 = 0
              THEN strftime(o_orderdate, '%Y-%m-%d')
              ELSE strftime(o_orderdate, '%Y%m%d') END AS mixed_fmt
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-03-01' AND o_orderdate < TIMESTAMP '1997-04-01'
)
SELECT o_orderkey, ymd,
       strftime(strptime(ymd, '%Y%m%d') + INTERVAL 30 DAY, '%Y%m%d') AS plus_30d,
       strftime(strptime(ymd, '%Y%m%d') + INTERVAL 2 MONTH, '%Y%m%d') AS plus_2mo,
       strftime(strptime(ymd, '%Y%m%d'), '%m.%d') AS label_mmdd,
       COALESCE(date_diff('day', DATE '1997-01-01',
                CAST(COALESCE(try_strptime(mixed_fmt, '%Y%m%d'),
                              try_strptime(mixed_fmt, '%Y-%m-%d')) AS DATE)), 0) AS days_since_ny
FROM o
""",
)
def string_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    o = orders.select(
        "o_orderkey",
        to_yyyymmdd(F.col("o_orderdate")).alias("ymd"),
        F.when(
            F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "yyyy-MM-dd")
        )
        .otherwise(to_yyyymmdd(F.col("o_orderdate")))
        .alias("mixed_fmt"),
    )
    return o.select(
        "o_orderkey",
        "ymd",
        add_days_str(F.col("ymd"), 30).alias("plus_30d"),
        to_yyyymmdd(F.add_months(from_yyyymmdd(F.col("ymd")), 2)).alias("plus_2mo"),
        F.date_format(from_yyyymmdd(F.col("ymd")), "MM.dd").alias("label_mmdd"),
        date_diff_tolerant(
            F.lit("1997-01-01"), F.col("mixed_fmt")
        ).alias("days_since_ny"),
    )


@register(
    "prefix_code_decode",
    operators="F7,X12,X17 (prefix predicate + substring codes + label decode map; ref data_loader.py:577-589, weather.py:112-139)",
    oracle="""
SELECT substr(p_type, 1, 3) AS type_cd,
       CASE substr(p_type, 1, 3)
         WHEN 'ECO' THEN 'economy' WHEN 'MED' THEN 'medium' WHEN 'SMA' THEN 'small'
         WHEN 'PRO' THEN 'promo' WHEN 'STA' THEN 'standard' WHEN 'LAR' THEN 'large'
         ELSE 'other' END AS type_label,
       COUNT(*) AS part_cnt,
       COUNT(CASE WHEN p_size > 25 THEN 1 END) AS big_cnt
FROM part
WHERE p_name LIKE 'sm%' OR p_name LIKE 'la%'
GROUP BY 1, 2
""",
)
def prefix_code_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("sm") | F.col("p_name").startswith("la")
    )
    size_cd = F.substring("p_type", 1, 3)
    label = (
        F.when(size_cd == "ECO", "economy")
        .when(size_cd == "MED", "medium")
        .when(size_cd == "SMA", "small")
        .when(size_cd == "PRO", "promo")
        .when(size_cd == "STA", "standard")
        .when(size_cd == "LAR", "large")
        .otherwise("other")
    )
    return part.groupBy(size_cd.alias("type_cd"), label.alias("type_label")).agg(
        F.count(F.lit(1)).alias("part_cnt"),
        F.count(F.when(F.col("p_size") > 25, 1)).alias("big_cnt"),
    )


@register(
    "safe_numeric_parse",
    operators="X18,X7 (try-cast numeric coercion with junk guard; ref weather.py:784-869)",
    oracle="""
WITH raw AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 7 = 0 THEN 'N/A'
              WHEN p_partkey % 11 = 0 THEN ''
              ELSE CAST(p_size AS VARCHAR) END AS size_str
  FROM part
)
SELECT COUNT(*) AS total_cnt,
       COUNT(TRY_CAST(size_str AS INTEGER)) AS parsed_cnt,
       COUNT(*) - COUNT(TRY_CAST(size_str AS INTEGER)) AS junk_cnt,
       CAST(SUM(COALESCE(TRY_CAST(size_str AS INTEGER), 0)) AS BIGINT) AS size_sum
FROM raw
""",
)
def safe_numeric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collector's "강수없음"-style junk guard: strings that may or may
    not be numeric, parsed with try_cast, junk counted and treated as 0."""
    part = table(spark, sf_dir, "part")
    raw = part.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 7 == 0, "N/A")
        .when(F.col("p_partkey") % 11 == 0, "")
        .otherwise(F.col("p_size").cast("string"))
        .alias("size_str"),
    )
    parsed = F.col("size_str").try_cast("int")
    return raw.agg(
        F.count(F.lit(1)).alias("total_cnt"),
        F.count(parsed).alias("parsed_cnt"),
        (F.count(F.lit(1)) - F.count(parsed)).alias("junk_cnt"),
        F.sum(F.coalesce(parsed, F.lit(0))).alias("size_sum"),
    )


@register(
    "locale_view_date",
    operators="UD3,X19 (UTC→locale view time, KOR +9 / VNM +7; ref docs/db/ins/02_TABLE.md:94-99)",
    oracle="""
WITH e AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'KOR' ELSE 'VNM' END AS locale,
         ts + CASE WHEN user_id % 2 = 0 THEN INTERVAL 9 HOUR
                   ELSE INTERVAL 7 HOUR END AS lts
  FROM events
)
SELECT locale,
       CAST(lts AS DATE) AS local_day,
       COUNT(*) AS n_events,
       CAST(MIN(EXTRACT(hour FROM lts)) AS INT) AS first_hour,
       CAST(MAX(EXTRACT(hour FROM lts)) AS INT) AS last_hour
FROM e
GROUP BY locale, CAST(lts AS DATE)
""",
)
def locale_view_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD3: events stored in UTC, viewed on each locale's business clock.

    The locale is derived deterministically from user_id parity (the synthetic
    stand-in for the reference's per-farm LOCALE column); all arithmetic is
    integer epoch-µs so the result is identical under any session timezone.
    """
    from inspig_etl_spark.functions.dates import US_PER_DAY, to_locale_us, us_to_day

    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, "KOR").otherwise("VNM").alias("locale"),
        "ts_us",
        F.col("user_id"),
    )
    local_us = to_locale_us(F.col("ts_us"), F.col("locale"))
    local_hour = F.floor((local_us % US_PER_DAY) / (3600 * 1_000_000)).cast("int")
    return (
        ev.select(
            "locale",
            us_to_day(local_us).alias("local_day"),
            local_hour.alias("lh"),
        )
        .groupBy("locale", "local_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("lh").alias("first_hour"),
            F.max("lh").alias("last_hour"),
        )
    )


_RW_END = "(od - CAST(CASE WHEN dayofweek(od) = 0 THEN 7 ELSE dayofweek(od) END AS INTEGER))"


@register(
    "report_week_rollup",
    operators="X4,A2,A13 (report-week Mon..Sun boundary per row, rolled up; ref orchestrator.py:148-160)",
    oracle=f"""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS od, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-03-01' AND o_orderdate < TIMESTAMP '1997-05-01'
)
SELECT {_RW_END} - 6 AS rw_start,
       {_RW_END}     AS rw_end,
       COUNT(*)       AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM o
GROUP BY 1, 2
""",
)
def report_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 as a distributed column expression: each order is assigned the last
    full Mon..Sun week strictly before its own date (the reference computes
    this once per run driver-side; here it is per-row and rolls up), then
    orders per report week. Groups are bounded by #weeks — tiny at any SF."""
    from inspig_etl_spark.functions.dates import (
        report_week_end_col,
        report_week_start_col,
    )

    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-05-01").cast("timestamp_ntz"))
    )
    od = F.col("o_orderdate").cast("date")
    return (
        o.select(
            report_week_start_col(od).alias("rw_start"),
            report_week_end_col(od).alias("rw_end"),
            "o_custkey",
        )
        .groupBy("rw_start", "rw_end")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )
