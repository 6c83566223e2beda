"""KMA weather code↔label decode maps and the mid-forecast text parse
(SURVEY.md §2.8 X17 — ``/root/reference/src/collectors/weather.py:354-393``
for the SKY/PTY/WEATHER_NAMES domains, ``weather.py:2332-2382`` for
``_parse_mid_weather`` / ``_weather_cd_to_sky_cd``).

All expression-only when-chains (whole-stage-codegen'd, no UDF), each with
a DuckDB SQL twin so every map is oracle-checkable. The code domains are
the public KMA forecast API's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 하늘상태 (sky condition), code → (weather_cd, Korean label).
SKY_CODES = {
    "1": ("sunny", "맑음"),
    "3": ("cloudy", "구름많음"),
    "4": ("overcast", "흐림"),
}

# 강수형태 (precipitation type).
PTY_CODES = {
    "0": ("none", "없음"),
    "1": ("rainy", "비"),
    "2": ("rain_snow", "비/눈"),
    "3": ("snow", "눈"),
    "4": ("shower", "소나기"),
}

# weather_cd → Korean display name (reverse lookup).
WEATHER_NAMES = {
    "sunny": "맑음",
    "cloudy": "구름많음",
    "overcast": "흐림",
    "rainy": "비",
    "rain_snow": "비/눈",
    "snow": "눈",
    "shower": "소나기",
}

# weather_cd → SKY code (weather.py:2365-2382; anything wet reads overcast).
WEATHER_TO_SKY = {
    "sunny": "1",
    "cloudy": "3",
    "overcast": "4",
    "rainy": "4",
    "rain_snow": "4",
    "snow": "4",
    "shower": "4",
}


def _chain(col: Column, mapping: dict[str, str], default: str | None) -> Column:
    expr = None
    for k, v in mapping.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    return expr.otherwise(default) if default is not None else expr


def _sql_chain(col: str, mapping: dict[str, str], default: str | None) -> str:
    whens = " ".join(f"WHEN {col} = '{k}' THEN '{v}'" for k, v in mapping.items())
    tail = f" ELSE '{default}'" if default is not None else ""
    return f"CASE {whens}{tail} END"


def sky_label(sky_cd: Column) -> Column:
    return _chain(sky_cd, {k: v[1] for k, v in SKY_CODES.items()}, None)


def sql_sky_label(sky_cd: str) -> str:
    return _sql_chain(sky_cd, {k: v[1] for k, v in SKY_CODES.items()}, None)


def pty_label(pty_cd: Column) -> Column:
    return _chain(pty_cd, {k: v[1] for k, v in PTY_CODES.items()}, None)


def sql_pty_label(pty_cd: str) -> str:
    return _sql_chain(pty_cd, {k: v[1] for k, v in PTY_CODES.items()}, None)


def weather_cd_to_sky_cd(weather_cd: Column) -> Column:
    return _chain(weather_cd, WEATHER_TO_SKY, "3")


def sql_weather_cd_to_sky_cd(weather_cd: str) -> str:
    return _sql_chain(weather_cd, WEATHER_TO_SKY, "3")


def parse_mid_weather_cd(wf: Column) -> Column:
    """``_parse_mid_weather`` (weather.py:2332-2362): precipitation words
    take priority over sky words; unknown/empty falls back to cloudy."""
    has = wf.contains
    return (
        F.when(wf.isNull() | (wf == ""), "cloudy")
        .when(has("비") & has("눈"), "rain_snow")
        .when(has("눈"), "snow")
        .when(has("비") | has("소나기"), "rainy")
        .when(has("맑음"), "sunny")
        .when(has("구름많음") | has("구름 많음"), "cloudy")
        .when(has("흐림") | has("흐리고"), "overcast")
        .otherwise("cloudy")
    )


def sql_parse_mid_weather_cd(wf: str) -> str:
    return f"""CASE
      WHEN {wf} IS NULL OR {wf} = '' THEN 'cloudy'
      WHEN {wf} LIKE '%비%' AND {wf} LIKE '%눈%' THEN 'rain_snow'
      WHEN {wf} LIKE '%눈%' THEN 'snow'
      WHEN {wf} LIKE '%비%' OR {wf} LIKE '%소나기%' THEN 'rainy'
      WHEN {wf} LIKE '%맑음%' THEN 'sunny'
      WHEN {wf} LIKE '%구름많음%' OR {wf} LIKE '%구름 많음%' THEN 'cloudy'
      WHEN {wf} LIKE '%흐림%' OR {wf} LIKE '%흐리고%' THEN 'overcast'
      ELSE 'cloudy'
    END"""


def weather_name(weather_cd: Column) -> Column:
    return _chain(weather_cd, WEATHER_NAMES, None)


def sql_weather_name(weather_cd: str) -> str:
    return _sql_chain(weather_cd, WEATHER_NAMES, None)
