"""Geo kernel (SURVEY.md §2.3 J11, §2.8 X15/X16, §2.10 UD4 — the
reference's client-side Haversine/Lambert Python functions re-expressed as
column expressions).

- Haversine great-circle distance as a pure column expression (the
  reference computes it per farm x station in Python,
  ``/root/reference/src/collectors/weather.py:142-148``).
- Lambert Conformal Conic lat/lon → KMA 5 km grid (``weather.py:279-326``),
  re-derived from the public KMA projection constants. The projection-wide
  constants (sn, sf, ro) are precomputed driver-side and embedded as double
  literals in BOTH the Spark expression and the oracle SQL, so only the
  per-row trig differs by at most 1 ulp between libms — far below the
  0.5-cell rounding margin.

Scale: nearest-station is a broadcast cross join (stations are bounded,
<=97 in the reference) + one row_number window per farm — shuffle O(|farms|),
never O(|farms| x |stations|) across the wire.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (X15) — built-ins only, codegen-friendly."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def haversine_a(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """The haversine PARAMETER a in [0, 1] — strictly monotone in distance.

    Rank/minimize on this instead of the full distance: it skips the
    asin/sqrt/2R per candidate pair, which at |farms| x |stations| pairs is
    the bulk of the trig budget. Convert only the winner via
    ``a_to_km``.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    return (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )


def a_to_km(a: Column) -> Column:
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def sql_haversine_a(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"(sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2))"
    )


def sql_haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2)))"
    )


# --- KMA Lambert Conformal Conic grid (X16) -------------------------------
# Public KMA DFS grid constants (5 km grid over Korea).
_RE = 6371.00877  # earth radius, km
_GRID = 5.0  # grid spacing, km
_SLAT1 = math.radians(30.0)
_SLAT2 = math.radians(60.0)
_OLON = math.radians(126.0)
_OLAT = math.radians(38.0)
_XO = 43.0
_YO = 136.0

_SN = math.log(math.cos(_SLAT1) / math.cos(_SLAT2)) / math.log(
    math.tan(math.pi / 4 + _SLAT2 / 2) / math.tan(math.pi / 4 + _SLAT1 / 2)
)
_SF = (math.tan(math.pi / 4 + _SLAT1 / 2) ** _SN) * math.cos(_SLAT1) / _SN
_RO = _RE / _GRID * _SF / (math.tan(math.pi / 4 + _OLAT / 2) ** _SN)


def lambert_grid(lat: Column, lon: Column) -> tuple[Column, Column]:
    """lat/lon degrees → (nx, ny) KMA grid cell, all expression math."""
    ra = F.lit(_RE / _GRID * _SF) / F.pow(
        F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2), F.lit(_SN)
    )
    theta = (F.radians(lon) - F.lit(_OLON)) * F.lit(_SN)
    nx = F.floor(ra * F.sin(theta) + F.lit(_XO) + F.lit(0.5)).cast("int")
    ny = F.floor(F.lit(_RO) - ra * F.cos(theta) + F.lit(_YO) + F.lit(0.5)).cast("int")
    return nx, ny


def sql_lambert_grid(lat: str, lon: str) -> tuple[str, str]:
    ra = f"({_RE / _GRID * _SF!r} / pow(tan({math.pi / 4!r} + radians({lat}) / 2), {_SN!r}))"
    theta = f"((radians({lon}) - {_OLON!r}) * {_SN!r})"
    nx = f"CAST(FLOOR({ra} * sin({theta}) + {_XO!r} + 0.5) AS INT)"
    ny = f"CAST(FLOOR({_RO!r} - {ra} * cos({theta}) + {_YO!r} + 0.5) AS INT)"
    return nx, ny
