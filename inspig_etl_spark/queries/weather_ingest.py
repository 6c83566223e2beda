"""Oracle-checked queries for the S3/S4 endpoint parsers
(``sources/weather_api.py`` — ref ``/root/reference/src/collectors/weather.py``
:741-982 village forecast, :984-1063 nowcast, :2193-2330 mid-term).

The raw API item tables are synthesized DETERMINISTICALLY from the test
tables with the same formulas on both engines (the pattern every composed
pipeline query here uses), so the decode kernels themselves — the village
forecast hourly/daily rollup, the nowcast category pivot, the ASOS
hourly/daily projections, and the mid-term +3..+10-day expansion — are
hash-checked end-to-end, on top of the edge-case unit tests in
tests/test_weather_api.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.weather_codes import (
    PTY_CODES,
    SKY_CODES,
    _sql_chain,
    sql_parse_mid_weather_cd,
    sql_weather_cd_to_sky_cd,
    sql_weather_name,
)
from inspig_etl_spark.queries import register
from inspig_etl_spark.sources.weather_api import (
    FCST_CATEGORIES,
    NCST_CATEGORIES,
    expand_mid_forecast,
    mid_land_reg_id,
    mid_ta_reg_id,
    parse_forecast_daily,
    parse_forecast_hourly,
    parse_ncst_items,
    sql_mid_land_reg_id,
    sql_mid_ta_reg_id,
)

BASE_DATE = "20240110"
BASE_TIME = "1200"

_RN1_VALUES = ("강수없음", "0.5mm", "2.25", "", "7.5mm")

_SQL_PTY_CD = _sql_chain("pty_eff", {k: v[0] for k, v in PTY_CODES.items() if k != "0"}, "unknown")
_SQL_PTY_NM = _sql_chain("pty_eff", {k: v[1] for k, v in PTY_CODES.items() if k != "0"}, "알수없음")
_SQL_SKY_CD = _sql_chain("sky_eff", {k: v[0] for k, v in SKY_CODES.items()}, "sunny")
_SQL_SKY_NM = _sql_chain("sky_eff", {k: v[1] for k, v in SKY_CODES.items()}, "맑음")

_SQL_NCST = f"""
WITH raw AS (
  SELECT CAST(event_id % 15 AS INT) AS nx,
         CAST(FLOOR(event_id / 7) % 15 AS INT) AS ny,
         (ARRAY[{", ".join(f"'{c}'" for c in NCST_CATEGORIES)}])[CAST(event_id % 7 AS INT) + 1] AS category
  FROM events
),
items AS (
  SELECT nx, ny, category,
         CASE category
           WHEN 'T1H' THEN CAST(nx % 35 - 5 AS VARCHAR)
           WHEN 'RN1' THEN (ARRAY[{", ".join(f"'{v}'" for v in _RN1_VALUES)}])[(nx + ny) % 5 + 1]
           WHEN 'REH' THEN CAST(30 + (nx * 3 + ny) % 70 AS VARCHAR)
           WHEN 'WSD' THEN CAST((nx + 2 * ny) % 12 AS VARCHAR) || '.5'
           WHEN 'VEC' THEN CAST((nx * 37 + ny * 11) % 360 AS VARCHAR)
           WHEN 'SKY' THEN (ARRAY['1', '3', '4'])[(nx + ny) % 3 + 1]
           WHEN 'PTY' THEN CAST((nx * 2 + ny) % 5 AS VARCHAR)
         END AS obsr_value
  FROM raw
),
wide AS (
  SELECT nx, ny,
         MAX(CASE WHEN category = 'T1H' THEN obsr_value END) AS t1h,
         MAX(CASE WHEN category = 'RN1' THEN obsr_value END) AS rn1,
         MAX(CASE WHEN category = 'REH' THEN obsr_value END) AS reh,
         MAX(CASE WHEN category = 'WSD' THEN obsr_value END) AS wsd,
         MAX(CASE WHEN category = 'VEC' THEN obsr_value END) AS vec,
         MAX(CASE WHEN category = 'SKY' THEN obsr_value END) AS sky,
         MAX(CASE WHEN category = 'PTY' THEN obsr_value END) AS pty
  FROM items GROUP BY nx, ny
),
eff AS (
  SELECT *,
         CASE WHEN pty IS NULL OR pty = '' THEN '0' ELSE pty END AS pty_eff,
         CASE WHEN sky IS NULL OR sky = '' THEN '1' ELSE sky END AS sky_eff
  FROM wide
)
SELECT nx, ny,
       '{BASE_DATE}' AS wk_date, '{BASE_TIME}' AS wk_time,
       TRY_CAST(t1h AS DOUBLE) AS temp,
       CAST(NULL AS INT) AS rain_prob,
       COALESCE(CASE WHEN rn1 IN ('강수없음', '') THEN 0.0
                     ELSE TRY_CAST(TRIM(REPLACE(rn1, 'mm', '')) AS DOUBLE) END,
                0.0) AS rain_amt,
       TRY_CAST(reh AS INT) AS humidity,
       TRY_CAST(wsd AS DOUBLE) AS wind_speed,
       TRY_CAST(vec AS INT) AS wind_dir,
       sky AS sky_cd,
       pty AS pty_cd,
       CASE WHEN pty_eff <> '0' THEN {_SQL_PTY_CD} ELSE {_SQL_SKY_CD} END AS weather_cd,
       CASE WHEN pty_eff <> '0' THEN {_SQL_PTY_NM} ELSE {_SQL_SKY_NM} END AS weather_nm,
       'N' AS is_forecast
FROM eff
"""


@register(
    "ncst_pivot_decode",
    operators="S4 (ultra-short nowcast: long category/obsrValue items -> wide typed record via fixed-list pivot + PTY-over-SKY weather decode; ref weather.py:423-491,984-1063)",
    oracle=_SQL_NCST,
)
def ncst_pivot_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    nx = (F.col("event_id") % 15).cast("int")
    ny = (F.floor(F.col("event_id") / 7) % 15).cast("int")
    raw = ev.select(
        nx.alias("nx"),
        ny.alias("ny"),
        F.element_at(
            F.array(*[F.lit(c) for c in NCST_CATEGORIES]),
            (F.col("event_id") % 7 + 1).cast("int"),
        ).alias("category"),
    )
    items = raw.select(
        "nx",
        "ny",
        F.lit(BASE_DATE).alias("base_date"),
        F.lit(BASE_TIME).alias("base_time"),
        "category",
        F.when(F.col("category") == "T1H", (F.col("nx") % 35 - 5).cast("string"))
        .when(
            F.col("category") == "RN1",
            F.element_at(
                F.array(*[F.lit(v) for v in _RN1_VALUES]),
                ((F.col("nx") + F.col("ny")) % 5 + 1).cast("int"),
            ),
        )
        .when(
            F.col("category") == "REH",
            (30 + (F.col("nx") * 3 + F.col("ny")) % 70).cast("string"),
        )
        .when(
            F.col("category") == "WSD",
            F.concat(((F.col("nx") + 2 * F.col("ny")) % 12).cast("string"), F.lit(".5")),
        )
        .when(
            F.col("category") == "VEC",
            ((F.col("nx") * 37 + F.col("ny") * 11) % 360).cast("string"),
        )
        .when(
            F.col("category") == "SKY",
            F.element_at(
                F.array(F.lit("1"), F.lit("3"), F.lit("4")),
                ((F.col("nx") + F.col("ny")) % 3 + 1).cast("int"),
            ),
        )
        .when(
            F.col("category") == "PTY",
            ((F.col("nx") * 2 + F.col("ny")) % 5).cast("string"),
        )
        .alias("obsr_value"),
    )
    return parse_ncst_items(items)


# --------------------------------------------------------------------------
# Mid-term expansion: grids from customer sigun codes, one synthetic ta and
# land response per regId, expanded to +3..+10-day rows.
# --------------------------------------------------------------------------

_MID_TEXTS = ("맑음", "구름많음", "흐리고 비", "흐림", "비/눈", "눈", "소나기", "구름 많음")

_SQL_GRIDS = f"""
  SELECT DISTINCT
         CAST(c_custkey % 12 AS INT) AS nx,
         CAST((c_custkey * 3) % 12 AS INT) AS ny,
         {sql_mid_ta_reg_id('sigun_cd')} AS ta_reg_id,
         {sql_mid_land_reg_id('sigun_cd')} AS land_reg_id
  FROM (
    SELECT c_custkey,
           CASE WHEN c_custkey % 97 = 0 THEN ''
                ELSE CAST(11 + (c_custkey % 45) AS VARCHAR) || '130' END AS sigun_cd
    FROM customer
  )
"""

# Per-day synthetic response fields are keyed only by the regId's bytes so
# the joined value is identical however many grids share the reg.
def _sql_mid_expand() -> str:
    """Build the 8-offset expansion as a UNION ALL mirroring inline()."""
    texts = ", ".join(f"'{t}'" for t in _MID_TEXTS)
    branches = []
    for d in range(3, 11):
        lo = f"CASE WHEN ({d} + t.a1) % 7 = 0 THEN NULL ELSE CAST(t.a1 * {d} % 15 AS INT) END"
        hi = f"CAST(t.a1 * {d} % 15 + 5 + {d} % 3 AS INT)"
        wf = f"(ARRAY[{texts}])[(l.a2 + {d}) % 8 + 1]"
        if d <= 7:
            am = f"CASE WHEN (l.a2 * {d}) % 11 = 3 THEN NULL ELSE CAST((l.a2 * {d}) % 101 AS INT) END"
            pm = f"CASE WHEN (l.a2 + {d} * 13) % 9 = 2 THEN NULL ELSE CAST((l.a2 + {d} * 13) % 101 AS INT) END"
            rain = (
                f"CASE WHEN ({am}) IS NULL AND ({pm}) IS NULL THEN CAST(NULL AS INT) "
                f"ELSE GREATEST(COALESCE({am}, 0), COALESCE({pm}, 0)) END"
            )
        else:
            rain = f"CAST((l.a2 * 7 + {d}) % 101 AS INT)"
        branches.append(
            f"""
  SELECT g.nx, g.ny, {d} AS day_offset,
         {lo} AS temp_low, {hi} AS temp_high,
         {wf} AS wf, {rain} AS rain_prob,
         l.a2 IS NOT NULL AS land_present
  FROM grids g
  LEFT JOIN ta t ON t.ta_reg_id = g.ta_reg_id
  LEFT JOIN land l ON l.land_reg_id = g.land_reg_id"""
        )
    return " UNION ALL ".join(branches)


_SQL_MID = f"""
WITH grids AS ({_SQL_GRIDS}),
ta AS (
  SELECT ta_reg_id, ASCII(SUBSTRING(ta_reg_id, 4, 1)) + ASCII(SUBSTRING(ta_reg_id, 8, 1)) AS a1
  FROM (SELECT DISTINCT ta_reg_id FROM grids)
  WHERE ASCII(SUBSTRING(ta_reg_id, 5, 1)) % 5 <> 0
),
land AS (
  SELECT land_reg_id, ASCII(SUBSTRING(land_reg_id, 3, 1)) + ASCII(SUBSTRING(land_reg_id, 4, 1)) AS a2
  FROM (SELECT DISTINCT land_reg_id FROM grids)
  WHERE ASCII(SUBSTRING(land_reg_id, 4, 1)) % 4 <> 1
),
expanded AS ({_sql_mid_expand()})
SELECT nx, ny,
       STRFTIME(DATE '2024-01-10' + day_offset, '%Y%m%d') AS wk_date,
       temp_low, temp_high,
       ROUND((temp_low + temp_high) / 2.0, 1) AS temp_avg,
       CASE WHEN land_present THEN rain_prob END AS rain_prob,
       CASE WHEN land_present THEN {sql_parse_mid_weather_cd('wf')} END AS weather_cd,
       CASE WHEN land_present THEN {sql_weather_name(sql_parse_mid_weather_cd('wf'))} END AS weather_nm,
       CASE WHEN land_present THEN {sql_weather_cd_to_sky_cd(sql_parse_mid_weather_cd('wf'))} END AS sky_cd,
       'Y' AS is_forecast
FROM expanded
WHERE temp_low IS NOT NULL OR temp_high IS NOT NULL
"""


@register(
    "mid_forecast_expand",
    operators="S4 (getMidTa + getMidLandFcst responses -> +3..+10-day grid rows: sigun->regId broadcast dims, array-of-structs inline expansion, AM/PM rain-prob max, X17 text parse; ref weather.py:2026-2162,2193-2330)",
    oracle=_SQL_MID,
)
def mid_forecast_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    sigun = F.when(F.col("c_custkey") % 97 == 0, F.lit("")).otherwise(
        F.concat((11 + F.col("c_custkey") % 45).cast("string"), F.lit("130"))
    )
    # persist(): the ta/land response dims are both derived FROM grids —
    # without materialization each derivation re-scans customer and re-runs
    # the distinct (3 scans total in the executed plan); cached, the fleet
    # table is read once and the two regId dims distinct over ~|grids| rows.
    grids = (
        c.select(
            (F.col("c_custkey") % 12).cast("int").alias("nx"),
            ((F.col("c_custkey") * 3) % 12).cast("int").alias("ny"),
            mid_ta_reg_id(sigun).alias("ta_reg_id"),
            mid_land_reg_id(sigun).alias("land_reg_id"),
        )
        .distinct()
        .persist()
    )

    a1 = (
        F.ascii(F.substring(F.col("ta_reg_id"), 4, 1))
        + F.ascii(F.substring(F.col("ta_reg_id"), 8, 1))
    ).alias("a1")
    ta_regs = (
        grids.select("ta_reg_id")
        .distinct()
        .where(F.ascii(F.substring(F.col("ta_reg_id"), 5, 1)) % 5 != 0)
        .select("ta_reg_id", a1)
    )
    ta_cols = [F.col("ta_reg_id")]
    for d in range(3, 11):
        lo = F.when((d + F.col("a1")) % 7 == 0, F.lit(None)).otherwise(
            (F.col("a1") * d % 15).cast("int")
        )
        hi = (F.col("a1") * d % 15 + 5 + d % 3).cast("int")
        ta_cols += [lo.alias(f"taMin{d}"), hi.alias(f"taMax{d}")]
    ta = ta_regs.select(*ta_cols)

    a2 = (
        F.ascii(F.substring(F.col("land_reg_id"), 3, 1))
        + F.ascii(F.substring(F.col("land_reg_id"), 4, 1))
    ).alias("a2")
    land_regs = (
        grids.select("land_reg_id")
        .distinct()
        .where(F.ascii(F.substring(F.col("land_reg_id"), 4, 1)) % 4 != 1)
        .select("land_reg_id", a2)
    )
    texts = F.array(*[F.lit(t) for t in _MID_TEXTS])
    land_cols = [F.col("land_reg_id")]
    for d in range(3, 11):
        wf = F.element_at(texts, ((F.col("a2") + d) % 8 + 1).cast("int"))
        if d <= 7:
            am = F.when((F.col("a2") * d) % 11 == 3, F.lit(None)).otherwise(
                ((F.col("a2") * d) % 101).cast("int")
            )
            pm = F.when((F.col("a2") + d * 13) % 9 == 2, F.lit(None)).otherwise(
                ((F.col("a2") + d * 13) % 101).cast("int")
            )
            land_cols += [
                wf.alias(f"wf{d}Am"),
                am.alias(f"rnSt{d}Am"),
                pm.alias(f"rnSt{d}Pm"),
            ]
        else:
            land_cols += [
                wf.alias(f"wf{d}"),
                ((F.col("a2") * 7 + d) % 101).cast("int").alias(f"rnSt{d}"),
            ]
    land = land_regs.select(*land_cols)

    return expand_mid_forecast(grids, ta, land, base_date=BASE_DATE)


# --------------------------------------------------------------------------
# S3 getVilageFcst: synthetic long-format forecast items from the orders
# table (values are pure functions of the grid/day/hour slot so duplicate
# items agree under the pivot's MAX), decoded by the kernels in
# sources/weather_api.py and replicated in DuckDB below.
# --------------------------------------------------------------------------

_FCST_BASE_DATE = "20240110"
_FCST_BASE_TIME = "1100"  # not 02/05 → the TMN/TMX 05:00 re-fetch applies

_PCP_VALUES = ("강수없음", "", "1.5mm", "2.25", "junk")
_FCST_SKY = ("1", "3", "4", "8")  # '8' exercises the unknown-code path
_FCST_PTY = ("0", "1", "2", "3", "4", "0", "0")

_SQL_FSKY_CD = _sql_chain("sky", {k: v[0] for k, v in SKY_CODES.items()}, "unknown")
_SQL_FSKY_NM = _sql_chain("sky", {k: v[1] for k, v in SKY_CODES.items()}, "알수없음")
_SQL_WNAME = _sql_chain(
    "p.wcd",
    {
        "sunny": "맑음", "cloudy": "구름많음", "overcast": "흐림", "rainy": "비",
        "rain_snow": "비/눈", "snow": "눈", "shower": "소나기",
    },
    "알수없음",
)

_SQL_FCST_ITEMS = f"""
raw AS (
  SELECT CAST(o_orderkey % 6 AS INT) AS nx,
         CAST(FLOOR(o_orderkey / 3) % 5 AS INT) AS ny,
         CAST(o_orderkey % 3 AS INT) AS day,
         CAST(FLOOR(o_orderkey / 7) % 8 AS INT) AS h3,
         (ARRAY[{", ".join(f"'{c}'" for c in FCST_CATEGORIES)}])[CAST(o_orderkey % 10 AS INT) + 1] AS category
  FROM orders
),
items AS (
  SELECT nx, ny,
         '202401' || CAST(10 + day AS VARCHAR) AS fcst_date,
         LPAD(CAST(h3 * 300 AS VARCHAR), 4, '0') AS fcst_time,
         category,
         CASE category
           WHEN 'TMP' THEN CAST((nx*3 + ny*5 + day*7 + h3*3) % 35 - 5 AS VARCHAR) || '.5'
           WHEN 'TMN' THEN CASE WHEN (nx + day) % 3 = 0 THEN ''
                                ELSE CAST((nx*2 + ny + day) % 15 - 3 AS VARCHAR) || '.1' END
           WHEN 'TMX' THEN CASE WHEN (ny + day) % 4 = 0 THEN 'n/a'
                                ELSE CAST((nx + ny*2 + day) % 15 + 18 AS VARCHAR) || '.9' END
           WHEN 'POP' THEN CAST((nx + ny*2 + day*3 + h3*3) % 101 AS VARCHAR)
           WHEN 'PCP' THEN (ARRAY[{", ".join(f"'{v}'" for v in _PCP_VALUES)}])[(nx + ny + day + h3*3) % 5 + 1]
           WHEN 'REH' THEN CAST(30 + (nx*3 + ny + h3*3) % 70 AS VARCHAR)
           WHEN 'WSD' THEN CAST((nx + 2*ny + h3*3) % 12 AS VARCHAR) || '.5'
           WHEN 'VEC' THEN CAST((nx*37 + ny*11 + h3*3) % 360 AS VARCHAR)
           WHEN 'SKY' THEN (ARRAY[{", ".join(f"'{v}'" for v in _FCST_SKY)}])[(nx + ny + day + h3) % 4 + 1]
           WHEN 'PTY' THEN (ARRAY[{", ".join(f"'{v}'" for v in _FCST_PTY)}])[(nx*2 + ny + h3 + day) % 7 + 1]
         END AS fcst_value
  FROM raw
),
wide AS (
  SELECT nx, ny, fcst_date, fcst_time,
         MAX(CASE WHEN category = 'TMP' THEN fcst_value END) AS tmp,
         MAX(CASE WHEN category = 'TMN' THEN fcst_value END) AS tmn,
         MAX(CASE WHEN category = 'TMX' THEN fcst_value END) AS tmx,
         MAX(CASE WHEN category = 'POP' THEN fcst_value END) AS pop,
         MAX(CASE WHEN category = 'PCP' THEN fcst_value END) AS pcp,
         MAX(CASE WHEN category = 'REH' THEN fcst_value END) AS reh,
         MAX(CASE WHEN category = 'WSD' THEN fcst_value END) AS wsd,
         MAX(CASE WHEN category = 'VEC' THEN fcst_value END) AS vec,
         MAX(CASE WHEN category = 'SKY' THEN fcst_value END) AS sky,
         MAX(CASE WHEN category = 'PTY' THEN fcst_value END) AS pty
  FROM items GROUP BY nx, ny, fcst_date, fcst_time
),
eff AS (
  SELECT *, CASE WHEN pty IS NULL OR pty = '' THEN '0' ELSE pty END AS pty_eff
  FROM wide
)"""


def _fcst_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of the oracle's ``items`` CTE (bit-identical values)."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderkey") % 6).cast("int").alias("nx"),
        (F.floor(F.col("o_orderkey") / 3) % 5).cast("int").alias("ny"),
        (F.col("o_orderkey") % 3).cast("int").alias("day"),
        (F.floor(F.col("o_orderkey") / 7) % 8).cast("int").alias("h3"),
        F.element_at(
            F.array(*[F.lit(c) for c in FCST_CATEGORIES]),
            (F.col("o_orderkey") % 10 + 1).cast("int"),
        ).alias("category"),
    )
    nx, ny, day, h3 = F.col("nx"), F.col("ny"), F.col("day"), F.col("h3")
    cat = F.col("category")
    value = (
        F.when(cat == "TMP", F.concat(((nx * 3 + ny * 5 + day * 7 + h3 * 3) % 35 - 5).cast("string"), F.lit(".5")))
        .when(cat == "TMN",
              F.when((nx + day) % 3 == 0, F.lit("")).otherwise(
                  F.concat(((nx * 2 + ny + day) % 15 - 3).cast("string"), F.lit(".1"))))
        .when(cat == "TMX",
              F.when((ny + day) % 4 == 0, F.lit("n/a")).otherwise(
                  F.concat(((nx + ny * 2 + day) % 15 + 18).cast("string"), F.lit(".9"))))
        .when(cat == "POP", ((nx + ny * 2 + day * 3 + h3 * 3) % 101).cast("string"))
        .when(cat == "PCP", F.element_at(F.array(*[F.lit(v) for v in _PCP_VALUES]),
                                         ((nx + ny + day + h3 * 3) % 5 + 1).cast("int")))
        .when(cat == "REH", (30 + (nx * 3 + ny + h3 * 3) % 70).cast("string"))
        .when(cat == "WSD", F.concat(((nx + 2 * ny + h3 * 3) % 12).cast("string"), F.lit(".5")))
        .when(cat == "VEC", ((nx * 37 + ny * 11 + h3 * 3) % 360).cast("string"))
        .when(cat == "SKY", F.element_at(F.array(*[F.lit(v) for v in _FCST_SKY]),
                                         ((nx + ny + day + h3) % 4 + 1).cast("int")))
        .when(cat == "PTY", F.element_at(F.array(*[F.lit(v) for v in _FCST_PTY]),
                                         ((nx * 2 + ny + h3 + day) % 7 + 1).cast("int")))
    )
    return base.select(
        "nx",
        "ny",
        F.lit(_FCST_BASE_DATE).alias("base_date"),
        F.lit(_FCST_BASE_TIME).alias("base_time"),
        F.concat(F.lit("202401"), (10 + day).cast("string")).alias("fcst_date"),
        F.lpad((h3 * 300).cast("string"), 4, "0").alias("fcst_time"),
        "category",
        value.alias("fcst_value"),
    )


def _fcst_fallback_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 05:00-announcement re-fetch: TMN/TMX items over a SUBSET of the
    (grid, day) space (weather.py:1395-1409) — uncovered slots stay NULL."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    base = o.select(
        (F.col("o_orderkey") % 6).cast("int").alias("nx"),
        (F.floor(F.col("o_orderkey") / 3) % 5).cast("int").alias("ny"),
        (F.col("o_orderkey") % 3).cast("int").alias("day"),
        F.when(F.col("o_orderkey") % 2 == 0, "TMN").otherwise("TMX").alias("category"),
    )
    nx, ny, day = F.col("nx"), F.col("ny"), F.col("day")
    value = F.when(
        F.col("category") == "TMN",
        F.concat(((nx + ny + day) % 12 - 2).cast("string"), F.lit(".3")),
    ).otherwise(F.concat(((nx + ny + day) % 12 + 20).cast("string"), F.lit(".7")))
    return base.select(
        "nx",
        "ny",
        F.concat(F.lit("202401"), (10 + day).cast("string")).alias("fcst_date"),
        "category",
        value.alias("fcst_value"),
    )


_SQL_FCST_HOURLY = f"""
WITH {_SQL_FCST_ITEMS}
SELECT nx, ny, fcst_date AS wk_date, fcst_time AS wk_time,
       TRY_CAST(tmp AS DOUBLE) AS temp,
       COALESCE(TRY_CAST(pop AS INT), 0) AS rain_prob,
       COALESCE(CASE WHEN pcp IN ('강수없음', '') THEN 0.0
                     ELSE TRY_CAST(TRIM(REPLACE(pcp, 'mm', '')) AS DOUBLE) END,
                0.0) AS rain_amt,
       TRY_CAST(reh AS INT) AS humidity,
       TRY_CAST(wsd AS DOUBLE) AS wind_speed,
       TRY_CAST(vec AS INT) AS wind_dir,
       sky AS sky_cd,
       pty AS pty_cd,
       CASE WHEN pty_eff <> '0' THEN {_SQL_PTY_CD} ELSE {_SQL_FSKY_CD} END AS weather_cd,
       CASE WHEN pty_eff <> '0' THEN {_SQL_PTY_NM} ELSE {_SQL_FSKY_NM} END AS weather_nm,
       '{_FCST_BASE_DATE}' AS base_date, '{_FCST_BASE_TIME}' AS base_time,
       'Y' AS is_forecast
FROM eff
"""


@register(
    "fcst_hourly_decode",
    operators="S3 (getVilageFcst hourly: long category items -> wide typed hourly forecast records, fixed-list pivot + per-hour PTY-over-SKY decode with unknown-code fallback; ref weather.py:741-888,968-982)",
    oracle=_SQL_FCST_HOURLY,
)
def fcst_hourly_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_forecast_hourly(_fcst_items(spark, sf_dir))


_SQL_FCST_DAILY = f"""
WITH {_SQL_FCST_ITEMS},
hr AS (
  SELECT nx, ny, fcst_date, fcst_time,
         TRY_CAST(tmp AS DOUBLE) AS temp_d,
         TRY_CAST(pop AS INT) AS pop_i,
         TRY_CAST(tmn AS DOUBLE) AS tmn_d,
         TRY_CAST(tmx AS DOUBLE) AS tmx_d,
         sky, pty,
         CASE WHEN pty_eff <> '0' THEN {_SQL_PTY_CD} ELSE {_SQL_FSKY_CD} END AS wcd
  FROM eff
),
base AS (
  SELECT nx, ny, fcst_date,
         COUNT(temp_d) AS temp_cnt,
         SUM(CAST(temp_d AS DECIMAL(18,1))) AS temp_sum_dec,
         MAX(temp_d) AS temp_high,
         MIN(temp_d) AS temp_low,
         MAX(pop_i) AS pop_max_raw,
         MAX(tmn_d) AS tmn_raw,
         MAX(tmx_d) AS tmx_raw,
         arg_min(sky, fcst_time) FILTER (WHERE sky IS NOT NULL) AS sky_first,
         arg_max(pty, fcst_time) FILTER (WHERE pty IS NOT NULL AND pty <> '0') AS pty_nz,
         arg_min(pty, fcst_time) FILTER (WHERE pty IS NOT NULL) AS pty_first
  FROM hr GROUP BY nx, ny, fcst_date
),
counts AS (
  SELECT nx, ny, fcst_date, wcd, COUNT(*) AS cnt, MIN(fcst_time) AS first_t
  FROM hr GROUP BY nx, ny, fcst_date, wcd
),
pick AS (
  SELECT nx, ny, fcst_date, wcd FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY nx, ny, fcst_date
                                 ORDER BY cnt DESC, first_t) AS rn
    FROM counts) WHERE rn = 1
),
fb_raw AS (
  SELECT CAST(o_orderkey % 6 AS INT) AS nx,
         CAST(FLOOR(o_orderkey / 3) % 5 AS INT) AS ny,
         CAST(o_orderkey % 3 AS INT) AS day,
         CASE WHEN o_orderkey % 2 = 0 THEN 'TMN' ELSE 'TMX' END AS category
  FROM orders WHERE o_orderkey % 5 = 0
),
fb AS (
  SELECT nx, ny, '202401' || CAST(10 + day AS VARCHAR) AS fcst_date,
         MAX(CASE WHEN category = 'TMN'
                  THEN TRY_CAST(CAST((nx + ny + day) % 12 - 2 AS VARCHAR) || '.3' AS DOUBLE) END) AS tmn_fb,
         MAX(CASE WHEN category = 'TMX'
                  THEN TRY_CAST(CAST((nx + ny + day) % 12 + 20 AS VARCHAR) || '.7' AS DOUBLE) END) AS tmx_fb
  FROM fb_raw GROUP BY nx, ny, day
)
SELECT b.nx, b.ny, b.fcst_date AS wk_date,
       CASE WHEN b.temp_sum_dec <> 0
            THEN ROUND(CAST(b.temp_sum_dec AS DOUBLE) / b.temp_cnt, 1) END AS temp_avg,
       b.temp_high, b.temp_low,
       COALESCE(b.tmn_raw, fb.tmn_fb) AS tmn,
       COALESCE(b.tmx_raw, fb.tmx_fb) AS tmx,
       GREATEST(COALESCE(b.pop_max_raw, 0), 0) AS rain_prob,
       p.wcd AS weather_cd,
       {_SQL_WNAME} AS weather_nm,
       b.sky_first AS sky_cd,
       COALESCE(b.pty_nz, b.pty_first) AS pty_cd,
       '{_FCST_BASE_DATE}' AS base_date, '{_FCST_BASE_TIME}' AS base_time,
       'Y' AS is_forecast
FROM base b
JOIN pick p ON p.nx = b.nx AND p.ny = b.ny AND p.fcst_date = b.fcst_date
LEFT JOIN fb ON fb.nx = b.nx AND fb.ny = b.ny AND fb.fcst_date = b.fcst_date
WHERE b.temp_cnt >= 2
"""


@register(
    "fcst_daily_rollup",
    operators="S3 (getVilageFcst daily: <2-temp-hour skip, hourly-min/max temps, decimal-exact avg with the 0.0-truthiness quirk, POP max, first-SKY/last-nonzero-PTY, mode weather with first-appearance tie-break, TMN/TMX 05:00 re-fetch backfill; ref weather.py:766-811,871-966,1395-1420)",
    oracle=_SQL_FCST_DAILY,
)
def fcst_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_forecast_daily(
        _fcst_items(spark, sf_dir),
        tmn_tmx_raw=_fcst_fallback_items(spark, sf_dir),
    )


# --------------------------------------------------------------------------
# S4 ASOS hourly/daily: per-row typed projections over synthesized station
# items (no pivot — each raw row decodes independently). Note the oracle's
# TRUNC: Spark's double→int cast truncates toward zero while DuckDB's CAST
# rounds, so the int(float(x)) reference semantics need an explicit TRUNC.
# --------------------------------------------------------------------------

_ASOS_RN = ("", "0.0", "2.5", "junk", "12.75")
_ASOS_SUM_RN = ("", "0.0", "junk", "5.25", "12.5")


def _asos_hourly_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    tm = (
        F.when(k % 37 == 0, F.lit("garbage"))
        .when(k % 41 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("2024-01-"), (10 + k % 5).cast("string"), F.lit(" "),
                F.lpad((F.floor(k / 3) % 24).cast("string"), 2, "0"), F.lit(":00"),
            )
        )
    )
    return p.select(
        (k % 9).cast("int").alias("nx"),
        (F.floor(k / 2) % 9).cast("int").alias("ny"),
        tm.alias("tm"),
        F.concat((k % 60 - 20).cast("string"), F.lit(".25")).alias("ta"),
        F.element_at(
            F.array(*[F.lit(v) for v in _ASOS_RN]), (k % 5 + 1).cast("int")
        ).alias("rn"),
        F.concat((30 + k % 70).cast("string"), F.lit(".8")).alias("hm"),
        F.concat((k % 12).cast("string"), F.lit(".6")).alias("ws"),
        F.concat((k % 360).cast("string"), F.lit(".9")).alias("wd"),
    )


_SQL_ASOS_HOURLY = f"""
WITH items AS (
  SELECT CAST(p_partkey % 9 AS INT) AS nx,
         CAST(FLOOR(p_partkey / 2) % 9 AS INT) AS ny,
         CASE WHEN p_partkey % 37 = 0 THEN 'garbage'
              WHEN p_partkey % 41 = 0 THEN NULL
              ELSE '2024-01-' || CAST(10 + p_partkey % 5 AS VARCHAR) || ' '
                   || LPAD(CAST(CAST(FLOOR(p_partkey / 3) AS BIGINT) % 24 AS VARCHAR), 2, '0') || ':00'
         END AS tm,
         CAST(p_partkey % 60 - 20 AS VARCHAR) || '.25' AS ta,
         (ARRAY[{", ".join(f"'{v}'" for v in _ASOS_RN)}])[p_partkey % 5 + 1] AS rn,
         CAST(30 + p_partkey % 70 AS VARCHAR) || '.8' AS hm,
         CAST(p_partkey % 12 AS VARCHAR) || '.6' AS ws,
         CAST(p_partkey % 360 AS VARCHAR) || '.9' AS wd
  FROM part
)
SELECT REPLACE(string_split(tm, ' ')[1], '-', '') AS wk_date,
       SUBSTR(REPLACE(string_split(tm, ' ')[2], ':', ''), 1, 4) AS wk_time,
       nx, ny,
       TRY_CAST(ta AS DOUBLE) AS temp,
       CAST(NULL AS INT) AS rain_prob,
       COALESCE(TRY_CAST(rn AS DOUBLE), 0.0) AS rain_amt,
       CAST(TRUNC(TRY_CAST(hm AS DOUBLE)) AS INT) AS humidity,
       TRY_CAST(ws AS DOUBLE) AS wind_speed,
       CAST(TRUNC(TRY_CAST(wd AS DOUBLE)) AS INT) AS wind_dir,
       CAST(NULL AS VARCHAR) AS sky_cd,
       CAST(NULL AS VARCHAR) AS pty_cd,
       CASE WHEN COALESCE(TRY_CAST(rn AS DOUBLE), 0.0) > 0 THEN 'rainy' ELSE 'sunny' END AS weather_cd,
       CASE WHEN COALESCE(TRY_CAST(rn AS DOUBLE), 0.0) > 0 THEN '비' ELSE '맑음' END AS weather_nm,
       'N' AS is_forecast
FROM items
WHERE tm IS NOT NULL AND len(string_split(tm, ' ')) >= 2
"""


@register(
    "asos_hourly_decode",
    operators="S4 (ASOS hourly station observations: per-row try_cast projection, malformed-timestamp drop, int(float(x)) truncation, rain-flip weather; ref weather.py:1153-1237)",
    oracle=_SQL_ASOS_HOURLY,
)
def asos_hourly_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspig_etl_spark.sources.weather_api import parse_asos_hourly_items

    return parse_asos_hourly_items(_asos_hourly_items(spark, sf_dir))


def _asos_daily_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    tm = (
        F.when(k % 31 == 0, F.lit(""))
        .when(k % 43 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("2024-01-"), (10 + k % 7).cast("string")))
    )
    return p.select(
        (k % 9).cast("int").alias("nx"),
        (F.floor(k / 2) % 9).cast("int").alias("ny"),
        tm.alias("tm"),
        F.concat((k % 50 - 10).cast("string"), F.lit(".25")).alias("avg_ta"),
        F.concat((k % 40 - 5).cast("string"), F.lit(".5")).alias("max_ta"),
        F.concat((k % 30 - 15).cast("string"), F.lit(".75")).alias("min_ta"),
        F.element_at(
            F.array(*[F.lit(v) for v in _ASOS_SUM_RN]), (k % 5 + 1).cast("int")
        ).alias("sum_rn"),
        F.concat((40 + k % 60).cast("string"), F.lit(".6")).alias("avg_rhm"),
        F.concat((k % 15).cast("string"), F.lit(".25")).alias("avg_ws"),
    )


_SQL_ASOS_DAILY = f"""
WITH items AS (
  SELECT CAST(p_partkey % 9 AS INT) AS nx,
         CAST(FLOOR(p_partkey / 2) % 9 AS INT) AS ny,
         CASE WHEN p_partkey % 31 = 0 THEN ''
              WHEN p_partkey % 43 = 0 THEN NULL
              ELSE '2024-01-' || CAST(10 + p_partkey % 7 AS VARCHAR)
         END AS tm,
         CAST(p_partkey % 50 - 10 AS VARCHAR) || '.25' AS avg_ta,
         CAST(p_partkey % 40 - 5 AS VARCHAR) || '.5' AS max_ta,
         CAST(p_partkey % 30 - 15 AS VARCHAR) || '.75' AS min_ta,
         (ARRAY[{", ".join(f"'{v}'" for v in _ASOS_SUM_RN)}])[p_partkey % 5 + 1] AS sum_rn,
         CAST(40 + p_partkey % 60 AS VARCHAR) || '.6' AS avg_rhm,
         CAST(p_partkey % 15 AS VARCHAR) || '.25' AS avg_ws
  FROM part
)
SELECT REPLACE(tm, '-', '') AS wk_date,
       nx, ny,
       ROUND(TRY_CAST(avg_ta AS DOUBLE), 1) AS temp_avg,
       ROUND(TRY_CAST(max_ta AS DOUBLE), 1) AS temp_high,
       ROUND(TRY_CAST(min_ta AS DOUBLE), 1) AS temp_low,
       CAST(NULL AS INT) AS rain_prob,
       ROUND(TRY_CAST(sum_rn AS DOUBLE), 1) AS rain_amt,
       CAST(TRUNC(TRY_CAST(avg_rhm AS DOUBLE)) AS INT) AS humidity,
       ROUND(TRY_CAST(avg_ws AS DOUBLE), 1) AS wind_speed,
       CASE WHEN TRY_CAST(sum_rn AS DOUBLE) > 0 THEN 'rainy' ELSE 'sunny' END AS weather_cd,
       CASE WHEN TRY_CAST(sum_rn AS DOUBLE) > 0 THEN '비' ELSE '맑음' END AS weather_nm,
       '1' AS sky_cd,
       'N' AS is_forecast
FROM items
WHERE tm IS NOT NULL AND tm <> ''
"""


@register(
    "asos_daily_decode",
    operators="S4 (ASOS daily station summaries: per-row try_cast projection, 1-decimal rounding, positive-rain weather flip, clear-sky default; ref weather.py:1064-1151)",
    oracle=_SQL_ASOS_DAILY,
)
def asos_daily_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspig_etl_spark.sources.weather_api import parse_asos_daily_items

    return parse_asos_daily_items(_asos_daily_items(spark, sf_dir))
