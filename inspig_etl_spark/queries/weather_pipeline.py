"""Composed weather-collector pipeline (SURVEY.md §7; S7/S8/S9 + X16 + A13
strung together the way ``WeatherCollector.run`` does —
``/root/reference/src/collectors/weather.py:1930-1993``):

1. farm lat/lon → KMA Lambert grid cells (X16, ``weather.py:120-160``);
2. short-term hourly forecast per cell (the stored TM_WEATHER_HOURLY
   state after the S7 MERGE);
3. nowcast observation MERGE — observed overwrites forecast for its hour
   (S8, ``weather.py:1879-1918``);
4. daily low/high/avg recomputed FROM THE STORED HOURLY rows, not the API
   payload (A13, ``weather.py:1770-1809`` ``_save_daily_today_aggregated``);
5. mid-term daily forecast insert-if-absent — never clobbers the
   short-term daily row, only fills future days (S9,
   ``weather.py:2406-2443``).

Inputs are synthesized deterministically from the ``customer`` table
(same formulas in Spark and the oracle), so the full composition is
hash-checkable end-to-end. The physical write between stages is the
partition-scoped sink (tests/test_sinks.py); here the stages compose as
one logical plan, which is exactly what they are on Delta/Iceberg where
the MERGEs stay engine-side.

Scale: cells are |farms|-bounded; the hour/day spines are per-row
``explode(sequence/array)`` — generation, not a join node; both MERGE
kernels shuffle on the (nx, ny[, date/hour]) key once; the daily rollup is
one partial-aggregated groupBy. No stage is O(|table|²) and nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.geo import lambert_grid, sql_lambert_grid
from inspig_etl_spark.queries import register
from inspig_etl_spark.sources.sinks import insert_if_absent, merge_upsert

TODAY = "20240115"
TOMORROW = "20240116"
NCST_HOUR = 12

_NX, _NY = sql_lambert_grid(
    "33.0 + (c_custkey % 500) / 100.0", "126.0 + ((c_custkey * 7) % 350) / 100.0"
)

_SQL = f"""
WITH cells AS (
  SELECT DISTINCT {_NX} AS nx, {_NY} AS ny FROM customer
),
hourly_fcst AS (
  SELECT nx, ny, CAST(h.range AS INT) AS hour,
         CAST(10 + (nx * 7 + ny * 13 + h.range * 3) % 15 AS INT) AS temp
  FROM cells CROSS JOIN range(24) h
),
ncst AS (
  SELECT nx, ny, {NCST_HOUR} AS hour,
         CAST(25 + (nx + ny) % 5 AS INT) AS temp
  FROM cells
),
hourly AS (  -- S8: observed overwrites forecast for its hour
  SELECT f.nx, f.ny, f.hour, COALESCE(n.temp, f.temp) AS temp
  FROM hourly_fcst f LEFT JOIN ncst n USING (nx, ny, hour)
),
daily_short AS (  -- A13: daily recomputed from stored hourly
  SELECT nx, ny, '{TODAY}' AS wk_date,
         MIN(temp) AS temp_low, MAX(temp) AS temp_high,
         CAST(FLOOR(SUM(temp) * 10 / 24.0) AS BIGINT) AS temp_avg_e1,
         'short' AS src
  FROM hourly GROUP BY nx, ny
),
mid AS (
  SELECT nx, ny, d.wk_date,
         CAST(8 + (nx + ny) % 4 AS INT) AS temp_low,
         CAST(18 + (nx * 3 + ny) % 6 AS INT) AS temp_high,
         CAST((8 + (nx + ny) % 4 + 18 + (nx * 3 + ny) % 6) * 5 AS BIGINT) AS temp_avg_e1,
         'mid' AS src
  FROM cells CROSS JOIN (VALUES ('{TODAY}'), ('{TOMORROW}')) d(wk_date)
)
SELECT * FROM daily_short
UNION ALL  -- S9: mid-term fills only keys absent from short-term
SELECT m.* FROM mid m
WHERE NOT EXISTS (
  SELECT 1 FROM daily_short s
  WHERE s.nx = m.nx AND s.ny = m.ny AND s.wk_date = m.wk_date
)
"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    lat = 33.0 + (F.col("c_custkey") % 500) / 100.0
    lon = 126.0 + ((F.col("c_custkey") * 7) % 350) / 100.0
    nx, ny = lambert_grid(lat, lon)
    return c.select(nx.alias("nx"), ny.alias("ny")).distinct()


@register(
    "weather_pipeline_day",
    operators="X16,S7,S8,S9,A13,ST4 (composed collector: grid -> hourly MERGE -> nowcast overwrite -> daily rollup from stored hourly -> mid-term insert-if-absent; ref weather.py:1930-1993)",
    oracle=_SQL,
)
def weather_pipeline_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _cells(spark, sf_dir)

    # Hour spine via explode(sequence) — per-row generation, no join node.
    hourly_fcst = cells.select(
        "nx",
        "ny",
        F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"),
    ).select(
        "nx",
        "ny",
        "hour",
        (10 + (F.col("nx") * 7 + F.col("ny") * 13 + F.col("hour") * 3) % 15)
        .cast("int")
        .alias("temp"),
    )

    ncst = cells.select(
        "nx",
        "ny",
        F.lit(NCST_HOUR).alias("hour"),
        (25 + (F.col("nx") + F.col("ny")) % 5).cast("int").alias("temp"),
    )
    # S8: keyed MERGE — the observed row replaces the forecast for its hour.
    hourly = merge_upsert(hourly_fcst, ncst, keys=["nx", "ny", "hour"])

    # A13: the daily row is re-aggregated from the STORED hourly state.
    daily_short = hourly.groupBy("nx", "ny").agg(
        F.min("temp").alias("temp_low"),
        F.max("temp").alias("temp_high"),
        F.floor(F.sum("temp") * 10 / F.lit(24.0)).cast("bigint").alias("temp_avg_e1"),
    ).select(
        "nx",
        "ny",
        F.lit(TODAY).alias("wk_date"),
        "temp_low",
        "temp_high",
        "temp_avg_e1",
        F.lit("short").alias("src"),
    )

    mid = cells.select(
        "nx",
        "ny",
        F.explode(F.array(F.lit(TODAY), F.lit(TOMORROW))).alias("wk_date"),
    ).select(
        "nx",
        "ny",
        "wk_date",
        (8 + (F.col("nx") + F.col("ny")) % 4).cast("int").alias("temp_low"),
        (18 + (F.col("nx") * 3 + F.col("ny")) % 6).cast("int").alias("temp_high"),
        ((8 + (F.col("nx") + F.col("ny")) % 4 + 18 + (F.col("nx") * 3 + F.col("ny")) % 6) * 5)
        .cast("bigint")
        .alias("temp_avg_e1"),
        F.lit("mid").alias("src"),
    )
    # S9: WHEN NOT MATCHED only — today's short-term row survives, only
    # tomorrow's mid-term rows are new.
    return insert_if_absent(daily_short, mid, keys=["nx", "ny", "wk_date"])


def observed_daily(spark: SparkSession, sf_dir: str, dates: list[str]) -> DataFrame:
    """ASOS-style observed daily rows for an arbitrary backfill window —
    the ST2 lookback source behind the runner's ``weather --backfill-days``
    (reference ``weather_etl.py:70-88`` ``--asos/--asos-days/--asos-start/
    --asos-end``; station parse ``weather.py:1064-1151``).

    One row per (grid cell, window date) with deterministic station-style
    lows/highs, tagged ``src='observed'`` so the MERGE that follows lets
    measured values overwrite forecast rows for their day (S8 precedence)
    while every key outside the window stays bit-identical.

    Scale: cells are |farms|-bounded and the window is exploded per row
    from an array literal (|dates| is CLI-bounded, days not data) — no join
    node, no driver collect.
    """
    cells = _cells(spark, sf_dir)
    day = F.substring(F.col("wk_date"), 7, 2).cast("int")
    low = (2 + (F.col("nx") * 5 + F.col("ny") * 3 + day) % 7).cast("int")
    high = (13 + (F.col("nx") * 2 + F.col("ny") * 7 + day) % 9).cast("int")
    return cells.select(
        "nx",
        "ny",
        F.explode(F.array(*[F.lit(d) for d in dates])).alias("wk_date"),
    ).select(
        "nx",
        "ny",
        "wk_date",
        low.alias("temp_low"),
        high.alias("temp_high"),
        ((low + high) * 5).cast("bigint").alias("temp_avg_e1"),
        F.lit("observed").alias("src"),
    )


_MID_TEXTS = ("맑음", "구름많음", "흐리고 비", "흐림", "비/눈", "눈", "소나기", "구름 많음")

from inspig_etl_spark.functions.weather_codes import (  # noqa: E402
    sql_parse_mid_weather_cd,
    sql_pty_label,
    sql_sky_label,
    sql_weather_cd_to_sky_cd,
    sql_weather_name,
)

_SQL_DECODE = f"""
WITH raw AS (
  SELECT event_id,
         (ARRAY[{", ".join(f"'{t}'" for t in _MID_TEXTS)}])[CAST(event_id % 8 AS INT) + 1] AS mid_txt,
         (ARRAY['1', '3', '4'])[CAST(event_id % 3 AS INT) + 1] AS sky_cd,
         CAST(event_id % 5 AS VARCHAR) AS pty_cd
  FROM events
),
parsed AS (
  SELECT event_id, mid_txt, sky_cd, pty_cd,
         {sql_parse_mid_weather_cd('mid_txt')} AS weather_cd
  FROM raw
)
SELECT event_id, mid_txt, weather_cd,
       {sql_weather_name('weather_cd')} AS weather_nm,
       {sql_weather_cd_to_sky_cd('weather_cd')} AS derived_sky_cd,
       {sql_sky_label('sky_cd')} AS sky_label,
       {sql_pty_label('pty_cd')} AS pty_label
FROM parsed
"""


@register(
    "weather_code_decode",
    operators="X17 (SKY/PTY code->label maps + mid-forecast Korean text parse + weather_cd->SKY reverse map; ref weather.py:354-393,2332-2382)",
    oracle=_SQL_DECODE,
)
def weather_code_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17 full decode surface: every SKY/PTY code labeled, every mid-term
    forecast text ('흐리고 비', '비/눈', ...) parsed to a weather_cd with
    precipitation priority, and the reverse weather_cd->SKY map."""
    from inspig_etl_spark.functions.weather_codes import (
        parse_mid_weather_cd,
        pty_label,
        sky_label,
        weather_cd_to_sky_cd,
        weather_name,
    )

    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _MID_TEXTS]),
            (F.col("event_id") % 8 + 1).cast("int"),
        ).alias("mid_txt"),
        F.element_at(
            F.array(F.lit("1"), F.lit("3"), F.lit("4")),
            (F.col("event_id") % 3 + 1).cast("int"),
        ).alias("sky_cd"),
        (F.col("event_id") % 5).cast("string").alias("pty_cd"),
    )
    parsed = raw.withColumn("weather_cd", parse_mid_weather_cd(F.col("mid_txt")))
    return parsed.select(
        "event_id",
        "mid_txt",
        "weather_cd",
        weather_name(F.col("weather_cd")).alias("weather_nm"),
        weather_cd_to_sky_cd(F.col("weather_cd")).alias("derived_sky_cd"),
        sky_label(F.col("sky_cd")).alias("sky_label"),
        pty_label(F.col("pty_cd")).alias("pty_label"),
    )
